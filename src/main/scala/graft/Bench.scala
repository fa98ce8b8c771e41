package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times the headline queries (Registry.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failures are recorded as -1
  * for that query and EXCLUDED from the total (with an "errors" list), so a
  * crashing query can never make the bench number look better. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader, shuffle machinery) once so the
    // first timed query doesn't pay classloading costs.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val names = Registry.benchNames.filter(Registry.byName.contains)
    // Two passes in one JVM, min per query: a single noisy run (GC pause,
    // page-cache miss, CI neighbor) can neither masquerade as nor mask a
    // real plan regression when the min of two runs is what gets compared.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    def timeOnce(name: String): Double = {
      val fn = Registry.byName(name).impl
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
    }
    val passes = (1 to runs).map(_ => names.map(n => n -> timeOnce(n)).toMap)
    val results = names.map { n =>
      val ok = passes.map(_(n)).filter(_ >= 0)
      (n, if (ok.isEmpty) -1.0 else ok.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // total_core: same numbers restricted to the FROZEN round-4 query list —
    // the round-comparable metric the 2×-baseline gate reads (BASELINE.md);
    // `total` keeps growing as new operators join benchNames.
    val core = Registry.benchCoreNames.toSet
    val totalCore = results.collect { case (k, v) if v >= 0 && core(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"total_core":$totalCore,"unit":"sec","runs":$runs,"queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
