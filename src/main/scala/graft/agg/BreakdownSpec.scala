package graft.agg

/** Parser + rewrites for the breakdown variable-spec grammar.
  *
  * Grammar (reference `commalist`, /root/reference/_gui.py:106-138): rows are
  * separated by `;`, cells by `,`. Each row is
  * `variable[=alias],op,weight1,weight2,…`. A row whose op cell is missing,
  * empty, or the literal `breakdown` is a group-by key
  * (/root/reference/bm_breakdown.py:86-91); all other rows are aggregate
  * outputs named `"var op"` unless aliased via `=`
  * (/root/reference/bm_breakdown.py:83-84, 100-101).
  */
object BreakdownSpec {

  /** One parsed spec row: raw cells, split into variable/alias/op/weights. */
  final case class Row(cells: Vector[String]) {
    private val v0 = cells.headOption.getOrElse("")
    // "volume=total_volume" → variable "volume", alias "total_volume"
    // (reference splits on the first '='; _LABEL, bm_breakdown.py:39, 83-84).
    val (variable: String, alias: String) =
      if (v0.nonEmpty && v0.indexOf('=') > 0) {
        val i = v0.indexOf('=')
        (v0.substring(0, i), v0.substring(i + 1))
      } else (v0, "")
    val op: String = if (cells.length > 1) cells(1) else ""
    val isKey: Boolean = cells.length == 1 || op.isEmpty || op == "breakdown"

    /** Weight cells: blanks dropped, embedded commas re-split, and (at
      * compile time) filtered to existing columns
      * (/root/reference/bm_breakdown.py:194-203). */
    val weights: Vector[String] =
      cells.drop(2).flatMap(_.split(",", -1)).filter(_.nonEmpty)

    /** Output column name: alias, else key name, else `"var op"`; `text`
      * rows keep the bare variable name (bm_breakdown.py:96-101). */
    def outName: String =
      if (alias.nonEmpty) alias
      else if (isKey || op == "text") variable
      else s"$variable $op"
  }

  final case class Spec(rows: Vector[Row]) {
    def keys: Vector[Row] = rows.filter(_.isKey)
    def aggs: Vector[Row] = rows.filterNot(_.isKey)
  }

  /** `"a,b;c,d"` → rows — commalist.parse (_gui.py:108-116). */
  def parse(s: String): Spec =
    Spec(s.split(";", -1).toVector.map(r => Row(r.split(",", -1).toVector)))

  /** Append weight `w` to every mean/sum row that doesn't already carry it —
    * vl_add_weight (/root/reference/vtk_reserves.py:92-98). Used to make all
    * reserve stats depletion-weighted (weight = `mine`). */
  def addWeight(spec: Spec, w: String): Spec = Spec(spec.rows.map { r =>
    if (r.cells.length > 1 && (r.op == "mean" || r.op == "sum") &&
        !r.cells.contains(w)) Row(r.cells :+ w)
    else r
  })

  /** Prepend a `region` group-by key unless some multi-cell row already
    * starts with "region" — vl_add_region
    * (/root/reference/vtk_reserves.py:100-107). */
  def addRegion(spec: Spec): Spec = {
    val has = spec.rows.exists(r =>
      r.cells.length > 1 && r.cells.head.startsWith("region"))
    if (has) spec else Spec(Row(Vector("region", "", "")) +: spec.rows)
  }
}
