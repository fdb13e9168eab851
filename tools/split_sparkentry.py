#!/usr/bin/env python3
"""One-shot mechanical split of SparkEntry.scala into per-family registry
files (VERDICT r11 task 6). Zero behavior change: query lambdas and oracle
SQL strings move verbatim; shared helpers/fixtures/SQL fragments move to
QueryShared; SparkEntry becomes a thin dispatcher concatenating the family
maps. Kept in tools/ as the audit trail of how the split was produced."""
import re, sys, os

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/registry"

FAMILIES = {
    "Breakdown": [1,2,3,4,5,6,7,8,9,10,48,54],
    "Spatial": [11,12,13,14,15,16,36,37,38,39,47,128],
    "Relational": [29,30,31,32,33,34,35,40,141,143,144,145],
    "Dedup": [20,21,22,23,43,44,53,60,63,66,67,71,72,73,77,87,88,94,95,
              100,104,107,115,136,153,154,175,176,177],
    "Text": [17,18,19,45,49,50,58,59,64,65,69,70,74,75,76,78,79,80,81,82,
             83,84,96,97,99,108,112,129,130,131,134,135,156,173],
    "Similarity": [24,25,41,51,52,62,98,101,102,105,106,110,127,132,133,
                   140,149,159,161,162,163,167,171,172,181,182],
    "Eval": [90,113,114,116,117,118,119,120,121,122,123,125,126,150,151,
             157,158,160,165,166,170,174],
    "Drift": [103,164,168,169,184,185,186],
    "Sampling": [55,56,57,68,85,89,111],
    "Sketch": [86,137,138],
    "Graph": [139,142,148,152],
    "Multimodal": [26,61,93,124,178,179,183],
    "Streaming": [27,28,42,91,92,109,146,147,155],
    "Pipeline": [46,180],
}
FAMILY_DOC = {
    "Breakdown": "§2.3/§2.4 — breakdown engine, filters/projections, capped/approx aggregates",
    "Spatial": "§2.5 — grids, region flags, depletion, elevation, shells, meshes",
    "Relational": "§2.6 beyond-reference relational — joins, windows, set ops, pivot, time buckets",
    "Dedup": "LLM pipeline: exact/near dedup, decontamination, components, containment, snapshots",
    "Text": "LLM pipeline: language/quality signals, BPE, LM scoring, DSIR, NB gates",
    "Similarity": "LLM pipeline: ANN (brute/IVF/PQ/stores), embeddings/PCA, retrieval + fusion",
    "Eval": "LLM pipeline: classifier/agreement/calibration/CI audits and rank statistics",
    "Drift": "LLM pipeline: PSI/KS/embedding drift monitors and their windowed forms",
    "Sampling": "LLM pipeline: deterministic hash splits, stratified/weighted sampling, mixtures",
    "Sketch": "LLM pipeline: Misra-Gries heavy hitters, count-min estimates and join sizing",
    "Graph": "LLM pipeline: PageRank, label propagation, triangles, multi-source BFS",
    "Multimodal": "LLM pipeline: image/audio/video decode, hashes, FLAC, box walks",
    "Streaming": "event analytics: windows, sessions, attribution, funnels, chat transcripts",
    "Pipeline": "end-to-end corpus curation compositions",
}

fam_of = {}
for fam, nums in FAMILIES.items():
    for n in nums:
        assert n not in fam_of, n
        fam_of[n] = fam

text = open(SRC).read()
lines = text.split("\n")

def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"anchor not found from {start}")

def map_region(header_pat):
    """(start_of_def_line, first_entry_line, closing_paren_line)"""
    d = find_line(lambda l: re.match(header_pat, l))
    close = find_line(lambda l: l == "  )", d)
    return d, close

def extract_entries(d, close):
    starts = [i for i in range(d + 1, close)
              if re.match(r'^    "q\d', lines[i])]
    entries = []
    for idx, s in enumerate(starts):
        # walk back over the comment/blank block directly above
        b = s
        while b - 1 > d and (lines[b-1].strip() == "" or
                             lines[b-1].lstrip().startswith("//")):
            b -= 1
        e = starts[idx + 1] if idx + 1 < len(starts) else close
        # walk the entry end back over trailing blank lines
        while e - 1 > s and lines[e-1].strip() == "":
            pass_e = e - 1
            # keep blank lines attached to the NEXT entry's comment block
            break
        name = re.match(r'^    "(q\d+[a-z0-9_]*)"', lines[s]).group(1)
        entries.append((name, b, e))
    # fix overlaps: entry k's block ends where entry k+1's comment block begins
    fixed = []
    for idx, (name, b, e) in enumerate(entries):
        if idx + 1 < len(entries):
            e = entries[idx + 1][1]
        fixed.append((name, b, e))
    return fixed

qd, qclose = map_region(r"  def queries: Map\[String")
# the oracle surface is TWO map literals split around CrossDedupSql:
#   def oracleSql = Map( ... ) ++ oracleSqlExt
#   private lazy val CrossDedupSql = ...
#   private lazy val oracleSqlExt = Map( ... )
od = find_line(lambda l: re.match(r"  def oracleSql: Map\[String", l))
oseam = find_line(lambda l: l == "  ) ++ oracleSqlExt", od)
oext = find_line(lambda l: re.match(
    r"  private lazy val oracleSqlExt: Map\[String", l), oseam)
oclose = find_line(lambda l: l == "  )", oext)
cross_a = find_line(lambda l: re.search(r"// shared by q95", l), oseam)
q_entries = extract_entries(qd, qclose)
o_entries = extract_entries(od, oseam) + extract_entries(oext, oclose)
assert len(q_entries) == len(o_entries) == 186, (len(q_entries), len(o_entries))
assert {n for n, _, _ in q_entries} == {n for n, _, _ in o_entries}

def qnum(name):
    return int(re.match(r"q(\d+)", name).group(1))

for n, _, _ in q_entries:
    assert qnum(n) in fam_of, n

def chunk(b, e):
    t = "\n".join(lines[b:e]).rstrip()
    if not t.endswith(","):
        t += ","
    return t

fam_q = {f: [] for f in FAMILIES}
fam_o = {f: [] for f in FAMILIES}
for name, b, e in q_entries:
    fam_q[fam_of[qnum(name)]].append((qnum(name), chunk(b, e)))
for name, b, e in o_entries:
    fam_o[fam_of[qnum(name)]].append((qnum(name), chunk(b, e)))

IMPORTS = """import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.Breakdown
import graft.model.{GridSchema, TriMesh}
import graft.operators.{Elevation, Factorize, FlagRegions, GridOps, MineDepletion, Tridist}
import graft.sources.Ingest
import graft.QueryShared._"""

os.makedirs(OUT_DIR, exist_ok=True)
for fam in FAMILIES:
    qs = "\n\n".join(t for _, t in sorted(fam_q[fam]))
    osql = "\n\n".join(t for _, t in sorted(fam_o[fam]))
    body = f"""package graft

{IMPORTS}

/** Query registry — {FAMILY_DOC[fam]}.
  *
  * Entries (and their DuckDB oracle SQL beside them) moved verbatim from
  * SparkEntry in the r12 per-family split; [[SparkEntry.queries]] is the
  * dispatcher that concatenates the families. Shared fixtures/helpers and
  * oracle SQL fragments live in [[QueryShared]]. */
object Queries{fam} {{

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{qs}
  )

  private[graft] val oracleSql: Map[String, String] = Map(
{osql}
  )
}}
"""
    with open(f"{OUT_DIR}/Queries{fam}.scala", "w") as f:
        f.write(body)

# ---- QueryShared: helpers + fixtures + oracle fragments -------------------
def region(a_pat, b_pat):
    a = find_line(lambda l: re.search(a_pat, l))
    b = find_line(lambda l: re.search(b_pat, l), a + 1)
    return a, b

r1a, r1b = region(r"  private def li\(", r"  /\*\* q62's standing-store setup")
r2a, r2b = region(r"  /\*\* q62's standing-store setup", r"  /\*\* Flagship:")
r3a, r3b = region(r"  /\*\* Shared base for the NB-gate query family",
                  r"  def dedupProbe\(")
r4a, r4b = region(r"  // ---- DuckDB oracle fragments",
                  r"  def oracleSql: Map\[String")

moved = lines[r1a:r1b] + [""] + lines[r2a:r2b] + [""] + lines[r3a:r3b] + \
    [""] + lines[r4a:r4b] + [""] + lines[cross_a:oext]
moved_text = "\n".join(moved)
moved_text = re.sub(r"(?m)^  private (val|def|lazy val) ",
                    r"  private[graft] \1 ", moved_text)
shared = f"""package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}
import org.apache.spark.sql.functions._

import graft.model.{{GridSchema, TriMesh}}

/** Shared substrate of the per-family query registries (r12 split):
  * the spatial fixtures + their analytic SQL, the pinned shared-scan
  * bases ([[raterBase]]/[[nbLangBase]]) with their release discipline
  * ([[materializedWithout]]), the memoized q62 ANN store, and every
  * DuckDB oracle SQL fragment the registries interpolate. All members
  * moved verbatim from SparkEntry; `private[graft]` so only the
  * registries and SparkEntry see them. */
object QueryShared {{
{moved_text.rstrip()}
}}
"""
with open(f"{OUT_DIR}/QueryShared.scala", "w") as f:
    f.write(shared)

# ---- rewrite SparkEntry ----------------------------------------------------
fams = list(FAMILIES)
qdispatch = (
    "  /** Dispatcher over the per-family registries (r12 split): each\n"
    "    * family file owns its query lambdas AND their oracle SQL side by\n"
    "    * side; this concatenation is the single driver-facing surface.\n"
    "    * Key disjointness is asserted — a duplicated qNN across families\n"
    "    * would otherwise silently shadow. */\n"
    "  def queries: Map[String, (SparkSession, String) => DataFrame] = {\n"
    "    val fams = Seq(\n      " +
    ",\n      ".join(f"Queries{f}.queries" for f in fams) + ")\n"
    "    val all = fams.reduce(_ ++ _)\n"
    "    require(all.size == fams.map(_.size).sum,\n"
    "      \"duplicate query name across family registries\")\n"
    "    all\n"
    "  }\n")
odispatch = (
    "  def oracleSql: Map[String, String] = {\n"
    "    val fams = Seq(\n      " +
    ",\n      ".join(f"Queries{f}.oracleSql" for f in fams) + ")\n"
    "    val all = fams.reduce(_ ++ _)\n"
    "    require(all.size == fams.map(_.size).sum,\n"
    "      \"duplicate oracle name across family registries\")\n"
    "    all\n"
    "  }\n")

keep = []
skip_spans = sorted([(r1a, r1b), (r2a, r2b), (r3a, r3b), (r4a, r4b),
                     (qd, qclose + 1), (od, oclose + 1)])
# sanity: the full oracle region (first map + CrossDedupSql + ext map) is
# one contiguous skip span — assert nothing else sits inside it
assert od < oseam < cross_a < oext < oclose
i = 0
spans = iter(skip_spans)
cur = next(spans, None)
replacements = {qd: qdispatch, od: odispatch}
while i < len(lines):
    if cur and i == cur[0]:
        if i in replacements:
            keep.append(replacements[i])
        i = cur[1]
        cur = next(spans, None)
        continue
    keep.append(lines[i])
    i += 1
new_entry = "\n".join(keep)
# entry()/probes still use the moved fixtures/helpers
new_entry = new_entry.replace(
    "import graft.sources.Ingest",
    "import graft.sources.Ingest\nimport graft.QueryShared._")
open(SRC, "w").write(new_entry)
print("families:", {f: len(v) for f, v in fam_q.items()})
print("done")
