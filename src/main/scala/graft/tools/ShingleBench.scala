package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the shingle-build shapes (r12 optimization round):
  *
  *   A. window form (current Dedup.shingles): posexplode + per-id lead
  *      window + global distinct — 2 exchanges, and the id-exchange
  *      carries (id, __txt, tok) per TOKEN, duplicating each document's
  *      full text across its token rows.
  *   B. projection form: split once, transform/slice/array_join +
  *      array_distinct per row, explode — ZERO exchanges before the
  *      consumer's own shuffle; higher-order functions are
  *      CodegenFallback but tokenization happens once per doc.
  *   C. B plus the gated Similarity.widen (scan yields 1 task at small
  *      scale; per-row gram work then single-threads).
  *
  * Each variant is timed on a count-distinct consumer so the comparison
  * includes the downstream shuffle the real operators pay.
  */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.documents(spark, sfDir)

    def windowForm(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val base = df.select(col("doc_id").as("id"), col("text").as("__txt"),
        split(col("text"), " ").as("__toks"))
      val exploded = base.select(col("id"), col("__txt"),
        size(col("__toks")).as("__ntok"),
        posexplode(col("__toks")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      val leads = (1 until n).map(i => lead(col("tok"), i).over(w))
      val withShingle = exploded.withColumn("shingle",
        when(col("__ntok") >= n && col("pos") <= col("__ntok") - n,
          concat_ws(" ", (col("tok") +: leads): _*))
          .when(col("__ntok") < n && col("pos") === 0, col("__txt")))
      withShingle.where(col("shingle").isNotNull)
        .select(col("id"), col("shingle"))
        .distinct()
    }

    def projForm(df: DataFrame, widen: Boolean): DataFrame = {
      val base0 = df.select(col("doc_id").as("id"), col("text").as("__txt"),
        split(col("text"), " ").as("__toks"))
      val base = if (widen) graft.ops.Similarity.widen(base0, "id") else base0
      base.select(col("id"), explode(
          when(size(col("__toks")) >= n,
            array_distinct(expr(
              s"""transform(sequence(1, size(__toks) - ${n - 1}),
                 | i -> concat_ws(' ', slice(__toks, i, $n)))""".stripMargin)))
            .otherwise(array(col("__txt")))).as("shingle"))
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shingle] $label rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def consume(sh: DataFrame): Long =
      sh.groupBy("shingle").agg(count(lit(1))).count()

    // interleaved, 3 reps each, mins printed last
    for (rep <- 1 to 3) {
      time(s"A window    rep$rep") { consume(windowForm(docs)) }
      time(s"B proj      rep$rep") { consume(projForm(docs, widen = false)) }
      time(s"C proj+wide rep$rep") { consume(projForm(docs, widen = true)) }
    }
    // sanity: identical output sets
    val a = windowForm(docs); val b = projForm(docs, widen = true)
    val d1 = a.except(b).count(); val d2 = b.except(a).count()
    println(s"[shingle] diff A-B=$d1 B-A=$d2 (both must be 0)")
    spark.stop()
  }
}
