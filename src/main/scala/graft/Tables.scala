package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (TESTDATA.md).
  *
  * Reference analog: the raw-zone reads in `jobs/vdt1.py:32-38` (CSV + ORC from a
  * lakeFS branch). Here everything is parquet at rest; CSV/ORC scan capabilities are
  * exercised by round-trip queries in [[graft.ops.Relational]].
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.parquet has shipped with two physical `ts` layouts across driver
    * testdata generations: TIMESTAMP(NANOS) — which Spark 4 refuses by
    * default, so we read nanos as long (legacy conf) and rebuild microseconds,
    * the same truncation DuckDB applies — and plain timestamp[us], which Spark
    * reads natively (as NTZ when the parquet lacks isAdjustedToUTC). Normalize
    * both to a session-UTC TimestampType column so every downstream window /
    * as-of / resample query sees one type regardless of the data generation. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(t(s, d, "events"))
  }

  /** Normalize the `ts` column to TimestampType (see [[events]]); under the
    * UTC session zone the NTZ→LTZ cast is value-preserving. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType)) // NTZ layout
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Scratch dir for sink round-trips and versioned-table roots. Kept under the
    * JVM tmpdir so nothing outside /root/repo or /tmp is touched.
    * Deletes any stale dir from a prior run so Spark's default ErrorIfExists
    * mode (and our versioned-table layer, which requires a fresh root) never
    * collides with leftover state. */
  def scratch(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_scratch", name)
    deleteRecursively(p)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
  }
}
