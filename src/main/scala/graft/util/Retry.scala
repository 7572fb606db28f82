package graft.util

/** Driver-side ingest retry with linear backoff — the reference's FTP
  * fetch policy (forecast_process.py:63-64,149-245: max 10 attempts,
  * 30 s × attempt backoff). Transport itself stays outside the engine
  * (SURVEY.md §2.14); this wrapper is what the driver adapters share.
  */
object Retry {
  def withLinearBackoff[T](maxAttempts: Int = 10, baseDelayMs: Long = 30000,
                           sleep: Long => Unit = Thread.sleep)(op: Int => T): T = {
    var attempt = 1
    var lastErr: Throwable = null
    while (attempt <= maxAttempts) {
      try return op(attempt)
      catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < maxAttempts) sleep(baseDelayMs * attempt)
          attempt += 1
      }
    }
    throw new RuntimeException(s"failed after $maxAttempts attempts", lastErr)
  }
}
