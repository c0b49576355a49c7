package graft.store

/** Bounded exponential-backoff retry for storage IO, re-expressing the
  * reference client's retry contract (RetryUtil.java:28-73: 1 s initial
  * backoff doubling to a 10 s cap, bounded retries, unrecoverable
  * errors passed straight through).
  *
  * The local-store analog of the reference's unrecoverable error codes
  * (ProjectNotExist, InvalidCursor, ...) are the PROTOCOL-level
  * filesystem signals: [[java.nio.file.NoSuchFileException]] (a racing
  * compaction deleted a file we listed — the caller must re-list, not
  * wait) and [[java.nio.file.FileAlreadyExistsException]] (an
  * optimistic version link lost its race — the caller must re-version).
  * Those pass through untouched, as does every non-IO exception
  * (contract violations are never transient). Only other
  * [[java.io.IOException]]s — the transient shared-storage failures the
  * reference rides out — are retried.
  *
  * One conscious divergence: the reference resets its retry counter on
  * HTTP 5xx (server errors are expected to clear eventually); a
  * filesystem has no equivalent error class, so every retry counts
  * against the bound. */
object Retry {

  /** Run `op`, retrying transient IO failures with exponential backoff.
    * `sleep` is injectable for deterministic tests. */
  def io[T](maxRetries: Int = 10, initialBackoffMs: Long = 1000,
      maxBackoffMs: Long = 10000,
      sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    var backoff = initialBackoffMs
    var retries = 0
    while (true) {
      try return op
      catch {
        case e: java.nio.file.NoSuchFileException => throw e
        case e: java.nio.file.FileAlreadyExistsException => throw e
        case e: java.io.IOException =>
          if (retries >= maxRetries) throw e
          retries += 1
          sleep(backoff)
          backoff = math.min(backoff * 2, maxBackoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
