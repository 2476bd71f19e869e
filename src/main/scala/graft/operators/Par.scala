package graft.operators

/** Run independent Spark actions concurrently — optimization-guide
  * §2.6 ("overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application, and actions are only
  * sequential because driver code calls them sequentially. A persisted
  * index is several relation writes with NO data dependency between
  * them; issuing them back-to-back leaves most executor slots idle
  * through each small job's scheduling + commit tail, while issuing
  * them together lets the next job's tasks back-fill the slots the
  * previous job's tail frees. At gate scale this collapses the
  * fixed per-job overhead to ~max instead of sum; at 100 TB scale the
  * same overlap fills the cluster through every write's straggler tail.
  *
  * Threads inherit the caller's job group / description (SparkContext
  * local properties are an InheritableThreadLocal), so a bench timeout
  * or driver cancelJobGroup still reaches every branch's jobs.
  *
  * All branches are ALWAYS joined before returning — an index write
  * must not commit its manifest while a sibling relation job is still
  * in flight — and the first failure rethrows after the join, so the
  * commit-marker discipline (manifest written last, only on full
  * success) is preserved exactly.
  */
object Par {

  /** Run every thunk concurrently; rethrow the first failure after all
    * have settled. Degenerates to inline execution for 0/1 thunks. */
  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.lengthCompare(1) <= 0) { thunks.foreach(_.apply()); return }
    val firstErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = thunks.zipWithIndex.map { case (f, i) =>
      val t = new Thread(
        () => try f() catch { case e: Throwable => firstErr.compareAndSet(null, e) },
        s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val e = firstErr.get()
    if (e != null) throw e
  }
}
