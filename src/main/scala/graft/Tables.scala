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
  /** events.parquet stores TIMESTAMP(NANOS), which Spark 4 refuses by
    * default; read nanos as long (legacy conf) and rebuild a microsecond
    * TimestampType column — the same truncation DuckDB applies. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
