package graft.ops

/** Driver-side job overlap (guide §2.6 "Overlap independent jobs"):
  * Spark's scheduler runs several jobs at once — actions are only
  * sequential because driver code calls them sequentially. These
  * helpers evaluate independent EAGER expressions (fits, checkpoint
  * pins) on separate driver threads so one job's task tail back-fills
  * with the other job's tasks instead of leaving executors idle, and
  * the driver round-trip latencies overlap instead of adding up.
  * 2-3 jobs in flight is the guide's guidance — these run exactly two.
  */
object DriverJobs {
  def par2[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
