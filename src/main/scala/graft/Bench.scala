package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times the headline queries (Registry.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failures are recorded as -1
  * for that query and EXCLUDED from the total (with an "errors" list), so a
  * crashing query can never make the bench number look better.
  *
  * SELF-ADJUDICATING artifact: three rounds running, the committed bench
  * artifact disagreed with clean re-runs because something heavy shared the
  * machine (r9: 5.2x -> 1.2x; r11: 1.30x -> 0.83x). The JSON therefore
  * carries (a) PER-PASS totals and per-query per-pass times — a contended
  * run shows uniform inflation across passes/queries, a real regression
  * shows one query slow in EVERY pass; (b) /proc/loadavg snapshots before
  * and after (fields: 1/5/15-min load + running/total processes), so a
  * reader can see the machine state without guessing; and (c)
  * "core_spread" = max/min of per-pass core totals — >1.3 means the box was
  * noisy and the min (which `total_core` already is) is the number to trust.
  * Default is min-of-3 (SPARK_GRAFT_BENCH_RUNS), matching the scale gate. */
object Bench {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

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
    val loadStart = loadavg()
    // Warm the JVM (codegen, parquet reader, shuffle machinery) once so the
    // first timed query doesn't pay classloading costs.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local iteration aid;
    // the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = Registry.benchNames.filter(Registry.byName.contains)
      .filter(n => only.forall(_(n)))
    // Min over passes in one JVM: a single noisy run (GC pause, page-cache
    // miss, CI neighbor) can neither masquerade as nor mask a real plan
    // regression when the min is what gets compared.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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
    val loadEnd = loadavg()
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val queryPasses = names.map { n =>
      "\"" + n + "\":[" + passes.map(p => f(p(n))).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // total_core: same numbers restricted to the FROZEN round-4 query list —
    // the round-comparable metric the 2×-baseline gate reads (BASELINE.md);
    // `total` keeps growing as new operators join benchNames.
    val core = Registry.benchCoreNames.toSet
    val totalCore = results.collect { case (k, v) if v >= 0 && core(k) => v }.sum
    // Pass totals exclude any query that failed in ANY pass: a partial pass
    // would otherwise read as a big pass-to-pass swing and make core_spread
    // cry "contended box" on an idle machine.
    val failedAnywhere: Set[String] =
      names.filter(n => passes.exists(_(n) < 0)).toSet
    val passCore = passes.map(p =>
      p.collect { case (k, v) if core(k) && !failedAnywhere(k) => v }.sum)
    val passTotal = passes.map(p =>
      p.collect { case (k, v) if !failedAnywhere(k) => v }.sum)
    val spread = if (passCore.nonEmpty && passCore.min > 0) passCore.max / passCore.min else -1.0
    println(s"""{"metric":"total","value":${f(total)},"total_core":${f(totalCore)},"unit":"sec","runs":$runs,""" +
      s""""pass_total_core":[${passCore.map(f).mkString(",")}],"pass_total":[${passTotal.map(f).mkString(",")}],""" +
      s""""core_spread":${f(spread)},"loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
      s""""queries":$qs,"query_passes":$queryPasses,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
