package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / conversation data preparation: generic operators over a
  * (conversation, turn_idx, role[, content]) table — the last mile between
  * event/session data and instruction-tuning corpora. Schema-agnostic:
  * any upstream (sessionization, log replay, annotation export) that can
  * produce ordered turns plugs in. */
object Chat {

  /** TURN VALIDATION — the SFT ingest gate: per conversation, the
    * structural facts every chat-format trainer asserts (starts with a
    * user turn, roles strictly alternate, ends on the assistant, ≥ 2
    * turns), as 0/1 flags plus the conjunction. Flags instead of a
    * filter so the reject REASONS are reportable (the eval-harness
    * convention).
    *
    * Shape at 100 TB: one shuffle by conversation shared by the lag
    * window and the aggregate (same partitioning); everything else is
    * map-side. All-integer output — exactly replayable cross-engine.
    * `idxCol` must be unique within a conversation (build it with a
    * row_number over the event order). */
  def validateTurns(df: DataFrame, convCol: String, idxCol: String,
      roleCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    df.select(col(convCol), col(idxCol), col(roleCol).as("_role"))
      .withColumn("_prev", lag(col("_role"), 1).over(w))
      .groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        when(min_by(col("_role"), col(idxCol)) === "user", 1).otherwise(0)
          .as("starts_user"),
        when(sum(when(col("_prev") === col("_role"), 1L).otherwise(0L))
          === 0L, 1).otherwise(0).as("alternates"),
        when(max_by(col("_role"), col(idxCol)) === "assistant", 1)
          .otherwise(0).as("ends_assistant"))
      .withColumn("valid",
        when(col("starts_user") === 1 && col("alternates") === 1 &&
          col("ends_assistant") === 1 && col("n_turns") >= 2, 1)
          .otherwise(0))
  }

  /** FLATTEN to a training string: turns concatenated in order as
    * `<|role|>content` — the chat-template step before tokenization /
    * packing ([[TextAnalysis.packSequences]] takes it from here).
    *
    * Shape at 100 TB: ONE groupBy(conversation) whose per-group state is
    * the conversation's own turns (collect_list + in-row sort — turns per
    * conversation are bounded; corpora are many-conversations, not
    * mega-conversations). Deterministic: the struct sort orders by
    * `idxCol` first (unique), so the assembled string is exact. */
  def flatten(df: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String): DataFrame =
    df.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col(idxCol).as("i"),
            col(roleCol).as("r"), col(contentCol).as("c")))),
          t => concat(lit("<|"), t.getField("r"), lit("|>"),
            t.getField("c"))), "").as("text"))
}
