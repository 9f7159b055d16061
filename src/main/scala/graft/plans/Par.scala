package graft.plans

/** Run independent Spark-action chains on a small thread pool so the
  * scheduler back-fills one chain's barriers/stragglers with another
  * chain's tasks (optimization guide §2.6 "overlap independent jobs").
  * Spark's scheduler is FIFO across concurrently-submitted jobs, which
  * is exactly the back-fill behaviour wanted; failures propagate to
  * the caller. Used by the round-latency-bound operators (q253 router,
  * q255 refresh) whose cost is many small serial jobs, not data. */
private[graft] object Par {
  def all[A](fs: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futures = fs.map(f => Future(f()))
      futures.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }
}
