package graft.operators

/** Runtime-warning surface: the JVM twin of the reference's paired
  * `warnings.warn(..., UserWarning)` + `logger.warning(...)` calls
  * (`pdq_hash.py:134-145`, `url.py:56-59`). Every operator warning goes
  * to the operator's slf4j logger AND to an optionally registered
  * handler, so library users can intercept warnings programmatically the
  * way Python users catch UserWarning.
  */
object Warnings {
  @volatile private var handler: String => Unit = _ => ()

  private[graft] def warn(log: org.slf4j.Logger, msg: String): Unit = {
    log.warn(msg)
    // a throwing user callback must not abort the operator call itself
    try handler(msg)
    catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"onWarning handler threw ${e.getClass.getName}: ${e.getMessage} — continuing")
    }
  }

  /** Register a callback invoked with every operator warning message
    * (pass `_ => ()` to clear). Driver-side only: warnings fire during
    * plan construction, not inside executor tasks. NB the registration
    * is process-wide (one handler per JVM, shared by all SparkSessions):
    * the last `onWarning` wins, like Python's global `warnings` filters.
    * Handler exceptions are caught, logged, and swallowed. */
  def onWarning(f: String => Unit): Unit = { handler = f }
}

/** Helpers for `Dataset.observe` telemetry. Observation names must be
  * unique within one query — two fixed-name invocations of the same
  * operator union'd/join'd into a single action fail analysis with
  * "Multiple definitions of observed metrics". Each invocation gets a
  * counter-suffixed name; listeners match on the stable prefix.
  */
object Telemetry {
  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def name(base: String): String = s"${base}_${ctr.incrementAndGet()}"
}
