package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The deep message/command normalizers of the reference's distill4
  * stage that go beyond per-row regexes: proxy-bot (Tupper) content
  * replacement needs a bounded look-AHEAD over the event stream, and
  * snippet resolution needs the command's resolution events folded
  * into its text. Both are single-shuffle window/aggregation shapes —
  * no self-joins, bounded state per row.
  */
object MessageNormalize {

  /** Tupper-style proxy dedup (reference: distill4_normalize.py:313-337
    * `normalize_message`): a user message often reappears within the
    * next few events as a webhook/bot repost with decorations stripped.
    * For each message row, scan the next 15 events of the same
    * instance for the FIRST bot message by a different author whose
    * non-empty content is a substring of this one; if its length is
    * 70–100% (exclusive) of the original, the repost's content
    * replaces the original.
    *
    * Shape: one window (collect the next-15 struct array, ~bounded per
    * row) + higher-order filter on the 15-element array — one shuffle
    * on the instance key, no join. Columns required: instanceCol,
    * ordCol (total event order), authorCol, botCol (boolean),
    * contentCol. Adds `norm_content`. */
  def tupperDedup(events: DataFrame, instanceCol: String, ordCol: String,
                  authorCol: String, botCol: String,
                  contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(instanceCol)).orderBy(col(ordCol))
      .rowsBetween(1, 15)
    val cands = collect_list(
      struct(col(authorCol).as("a"), col(botCol).as("b"),
        col(contentCol).as("c"))).over(w)
    // try_element_at: null (not an ANSI error) when no candidate matches
    val firstSimilar = try_element_at(
      filter(col("_cands"), c =>
        c.getField("b") && c.getField("a") =!= col(authorCol) &&
          c.getField("c") =!= "" &&
          col(contentCol).contains(c.getField("c"))), lit(1))
    val ratio = length(col("_sim").getField("c")).cast("double") /
      length(col(contentCol)).cast("double")
    events
      .withColumn("_cands", cands)
      .withColumn("_sim", firstSimilar)
      .withColumn("norm_content",
        when(col("_sim").isNotNull && ratio > 0.7 && ratio < 1.0,
          col("_sim").getField("c")).otherwise(col(contentCol)))
      .drop("_cands", "_sim")
  }

  /** Snippet resolution (reference: distill4_normalize.py:349-375
    * `normalize_command_group`): each snippet-resolution event of a
    * command's message group replaces the FIRST word of the command
    * equal to its snippet name with its expanded content (one
    * replacement per snippet, in resolution order); the server prefix
    * is canonicalized to "!" first.
    *
    * Shape: snippets fold over the command's word array with
    * aggregate/array_position — per-row HOFs on bounded arrays, no
    * extra shuffle beyond the snippet collect.
    *
    * @param commands (cmdIdCol, contentCol, prefixCol)
    * @param snippets (cmdIdCol, ordCol, nameCol, afterCol) — one row
    *                 per snippet_resolution event. */
  def resolveSnippets(commands: DataFrame, snippets: DataFrame,
                      cmdIdCol: String, contentCol: String, prefixCol: String,
                      ordCol: String, nameCol: String,
                      afterCol: String): DataFrame = {
    val snips = snippets
      .groupBy(col(cmdIdCol))
      .agg(array_sort(collect_list(struct(col(ordCol).as("o"),
        col(nameCol).as("n"), col(afterCol).as("x")))).as("_snips"))
    val prefixed = graft.functions.TextFunctions
      .normalizeCommandPrefix(col(contentCol), col(prefixCol))
    commands
      .join(snips, Seq(cmdIdCol), "left")
      .withColumn("_words", split(prefixed, " "))
      .withColumn("norm_command",
        when(col("_snips").isNull, array_join(col("_words"), " "))
          .otherwise(array_join(
            aggregate(col("_snips"), col("_words"),
              (ws, sn) => {
                val pos = array_position(ws, sn.getField("n"))
                when(pos > 0,
                  concat(
                    slice(ws, lit(1), (pos - 1).cast("int")),
                    array(sn.getField("x")),
                    slice(ws, (pos + 1).cast("int"), size(ws)))
                ).otherwise(ws)
              }), " ")))
      .drop("_snips", "_words")
  }
}
