package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM, one session). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf: String = "/root/testdata/sf0.001"
}

/** Store-agnostic test backdoors (aging objects for stale-slot sweeps). */
object StoreOps {
  def backdate(store: graft.vt.MetaStore, key: java.nio.file.Path, toMs: Long): Unit =
    store match {
      case s: graft.vt.S3SimMetaStore => s.backdate(key, toMs)
      case s: graft.vt.InMemoryMetaStore => s.backdate(key, toMs)
      case _ => java.nio.file.Files.setLastModifiedTime(key,
        java.nio.file.attribute.FileTime.fromMillis(toMs))
    }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
