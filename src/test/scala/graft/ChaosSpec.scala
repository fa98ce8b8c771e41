package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.Tag

import graft.vt.VersionedTable

/** Cross-process chaos: REAL JVM writer processes, REAL SIGKILL. */
object ChaosTag extends Tag("graft.Chaos")

class ChaosSpec extends SparkSpec {
  import spark.implicits._

  // mirror of build.sbt's jdk17AddOpens: the spawned JVMs create their own
  // SparkSession outside spark-submit, which normally injects these
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("real cross-process writers with kill -9: versions gap-free, head readable, vacuum un-wedges",
      ChaosTag) {
    val root = Tables.scratch("chaos_xp")
    val vt = VersionedTable.create(root)
    vt.write(Seq(0).toDF("x"), "main", "v0")

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    def launch(id: Int, n: Int): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx1g", "-cp",
        System.getProperty("java.class.path"), "graft.ChaosWriter",
        root, id.toString, n.toString)
      new ProcessBuilder(cmd.asJava).redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"/tmp/chaos_writer_$id.log")).start()
    }
    // three writers hammer the same table; two get SIGKILLed while the
    // commit stream is actively advancing (kills are PROGRESS-triggered, not
    // clock-triggered, so they land mid-hammer — possibly mid-claim,
    // mid-commit-write, or mid-ref-advance — regardless of how long the
    // spawned JVMs take to boot Spark); the third runs to completion.
    // Writers 1-2 get a large quota so they are still writing when killed.
    val writers = Seq(launch(1, 500), launch(2, 500), launch(3, 8))
    def commitCount: Int = {
      val s = Files.list(Paths.get(root).resolve("commits"))
      try s.iterator().asScala.size finally s.close()
    }
    def waitForCommits(min: Int, timeoutMs: Long): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (commitCount < min && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    }
    waitForCommits(4, 90000); writers(0).destroyForcibly()
    waitForCommits(commitCount + 2, 60000); writers(1).destroyForcibly()
    writers(2).waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    writers.foreach(_.destroyForcibly())
    writers.foreach(_.waitFor(10, java.util.concurrent.TimeUnit.SECONDS))

    // invariant 1: whatever landed, history is gap-free and monotonic
    def assertLineage(): Long = {
      val lin = vt.lineage("main")
      assert(lin.map(_.version) === (lin.head.version to 0L by -1).toList,
        s"gap or non-monotonic versions: ${lin.map(_.version)}")
      lin.head.version
    }
    val v1 = assertLineage()
    // invariant 2: the head is readable, and append-only single-row commits
    // mean exactly version+1 rows — no torn or half-applied commit visible
    assert(vt.read(spark, "main").count() === v1 + 1)

    // invariant 3: vacuum un-wedges whatever the kills left behind (stale
    // claimed slots, published-but-unreferenced orphans) and a fresh write
    // then lands. Age every slot past the stale horizon first, as time would.
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * VersionedTable.DefaultStaleSlotMs)
    def ageSlots(): Unit = {
      val locks = Paths.get(root).resolve("locks")
      if (Files.isDirectory(locks)) {
        val s = Files.list(locks)
        try s.iterator().asScala.foreach(p => Files.setLastModifiedTime(p, past))
        finally s.close()
      }
    }
    var landed = false
    var tries = 0
    while (!landed && tries < 3) {
      ageSlots()
      vt.vacuum(retainLast = 100000)
      try {
        vt.write(Seq(999).toDF("x"), "main", "post-chaos append", mode = "append")
        landed = true
      } catch { // an orphan replay advanced the head between our read and write
        case _: java.util.ConcurrentModificationException => tries += 1
      }
    }
    assert(landed, s"branch still wedged after $tries vacuum+retry rounds")

    // invariant 4: still gap-free afterwards, and every published version's
    // CAS slot survived the vacuum
    val v2 = assertLineage()
    assert(v2 > v1) // the post-chaos append is visible
    vt.lineage("main").foreach(c => assert(
      Files.exists(Paths.get(root).resolve("locks").resolve(s"main-v${c.version}")),
      s"published slot main-v${c.version} was reclaimed"))
    assert(vt.read(spark, "main").count() === v2 + 1)
  }
}
