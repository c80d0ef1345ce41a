package graft.core

/** Named wall-clock collector for sub-query phases the bench artifact
  * must surface — e.g. `dim_wide_join_smalldelta`'s bulk-seed commit
  * vs each ~1% delta commit. The query's single bench timing hides
  * the part that actually gates the 100 TB claim (the per-delta
  * cost drowns in the view-sized seed), so phases record themselves
  * here and Bench emits a `"walls"` member — per-phase MIN across
  * runs, matching the per-query min-of-runs policy. Verify/spec runs
  * record too; harmless (nothing reads the map unless asked). */
object Walls {

  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def record(name: String, sec: Double): Unit = {
    m.merge(name, sec, (a, b) => math.min(a, b)); ()
  }

  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    record(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  def clear(): Unit = m.clear()
}
