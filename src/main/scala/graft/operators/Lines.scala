package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate dedup (SURVEY C45) — the CCNet/RefinedWeb
  * "remove duplicated lines/paragraphs" pass (Wenzek et al. 2020 run
  * it per shard; Penedo et al. 2023 §4.2 line-wise): a LINE that
  * occurs, after normalization, in at least `minDocs` DISTINCT
  * documents is boilerplate (nav bars, cookie banners, footers,
  * share buttons) and is dropped from every document that carries
  * it; the surviving lines re-emit in original order.
  *
  * Granularity is the point: document-level dedup (C1-C5) keeps one
  * copy of a page and its boilerplate; span-level rewrite (C35)
  * needs n consecutive shared TOKENS and cuts mid-sentence; the line
  * is the natural unit of web boilerplate, and this pass deletes it
  * from EVERY page including the kept ones.
  *
  * Contract: lines are the '\n' splits of `text` (null text ⇒ 0
  * lines); the duplicate key is the normalized line — `lower`,
  * trim, inner whitespace collapsed to single spaces — but the
  * OUTPUT re-emits the original line text unchanged. Lines whose
  * normalized form is empty (blank/whitespace) are never counted and
  * never removed: blank separators are structure, not boilerplate.
  * A doc repeating a hot line k times loses all k copies; a line
  * repeated k times within ONE doc only does not become hot
  * (distinct-doc count, not occurrence count).
  *
  * Shape (linear in corpus lines, two hash shuffles): lines explode
  * map-side with positions; hot-line detection is one hash agg over
  * distinct (doc, normalized-line) — map-side partial distinct, so a
  * footer in a billion docs ships one row per doc, and the count agg
  * itself is AQE-splittable on skew; removal is a LEFT ANTI hash
  * equi-join on the normalized line (never a per-doc array scan);
  * reassembly is one per-doc hash agg (collect_list of (p, line),
  * array_sort — p unique per doc so struct order is total). At
  * 100 TB the hot-line table is tiny (boilerplate is by definition
  * few distinct strings) and AQE broadcasts the anti-join build
  * side; nothing is pairwise and no global sort exists.
  */
object Lines {

  /** (id, n_lines, kept_lines, removed_frac, kept_text). */
  def removeDupLines(df: DataFrame, id: Column, text: Column,
                     minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(id.as("id"),
      posexplode(when(text.isNull, array().cast("array<string>"))
        .otherwise(split(text, "\n"))).as(Seq("p", "line")))
      .withColumn("nl", trim(regexp_replace(lower(col("line")), "\\s+", " ")))
    // normalized lines in >= minDocs distinct docs; '' never counts
    val hot = lines.filter(col("nl") =!= "")
      .select(col("id"), col("nl")).distinct()
      .groupBy(col("nl")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select(col("nl"))
    val kept = lines.join(hot, Seq("nl"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("kept_lines"),
        array_join(transform(array_sort(collect_list(struct(col("p"), col("line")))),
          s => s.getField("line")), "\n").as("kept_text"))
    df.select(id.as("id"),
      when(text.isNull, lit(0L)).otherwise(size(split(text, "\n")).cast("long"))
        .as("n_lines"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        when(col("n_lines") > 0,
          round((col("n_lines") - coalesce(col("kept_lines"), lit(0L)))
            .cast("double") / col("n_lines"), 6))
          .otherwise(lit(0.0)).as("removed_frac"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
