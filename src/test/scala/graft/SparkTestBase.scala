package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** One shared local session for all suites (getOrCreate reuses it). */
object TestSession {
  /** Set once the lazy session exists — suite teardown must never
    * CREATE a session just to clean it. */
  @volatile private[graft] var started = false
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS) — same session-level setting
      // Sessions.local applies (Tables.events no longer flips it per-read)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    started = true
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSession.spark

  /** Suite-boundary hygiene for the ONE shared session (r11, after a
    * driver-side `sbt test` run died with a RejectedExecutionException
    * from a terminated scheduler pool): a suite that failed mid-stream
    * can leave its streaming query's micro-batch thread running, and
    * that straggler keeps submitting jobs into later suites — and into
    * the JVM-shutdown window where the scheduler pool is already
    * terminated. Stop any still-active queries and drop cached blocks
    * at every suite boundary so no async work outlives the suite that
    * started it. No-op when the suite never touched Spark. */
  override protected def afterAll(): Unit = {
    if (TestSession.started) {
      val s = TestSession.spark
      try s.streams.active.foreach(q => try q.stop() catch {
        case _: Exception => ()
      }) catch { case _: Exception => () }
      try s.catalog.clearCache() catch { case _: Exception => () }
    }
    super.afterAll()
  }
  val sf0001 = "/root/testdata/sf0.001"

  /** Order-insensitive row comparison. */
  def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (rowsOf(a), rowsOf(b))
    assert(ra == rb, s"\nleft : ${ra.take(5)}\nright: ${rb.take(5)}")
  }

  def tsOf(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))
}
