package graft

/** Run several INDEPENDENT driver actions concurrently (the guide's
  * overlap-independent-jobs rule: Spark's scheduler happily runs many
  * jobs at once inside one application — actions are only sequential
  * because the driver calls them sequentially). Used where an operator
  * materializes several independent relations back to back (the four
  * per-modality sketch checkpoints of the media verdict, the seven
  * corpus-state table writes): each thunk runs on its own driver
  * thread, the FIFO scheduler back-fills executors across the jobs'
  * straggler tails, and the wall-clock cost drops from the SUM of the
  * materializations to roughly the longest one plus contention.
  *
  * Results return in input order; the first failing thunk's exception
  * propagates (the remaining jobs finish or fail on their own — same
  * all-or-nothing contract as the sequential spelling). */
private[graft] object Par {

  def all[A](thunks: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = thunks.map(t => Future(t()))
    fs.map(Await.result(_, Duration.Inf))
  }

  /** Two-result spelling with precise types. */
  def both[A, B](a: () => A, b: () => B): (A, B) = {
    val r = all(Seq(() => a().asInstanceOf[AnyRef],
      () => b().asInstanceOf[AnyRef]))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
