package graft

/** Shared test-side I/O capture helpers. */
object TestIO {
  /** Capture everything written to System.err while `body` runs.
    * Swaps the GLOBAL stderr stream — callers are the suite-local
    * single-threaded test bodies; do not use around code that runs
    * concurrently with other stderr writers you care about. */
  def withStderr(body: => Unit): String = {
    val buf = new java.io.ByteArrayOutputStream()
    val prior = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try body finally System.setErr(prior)
    buf.toString("UTF-8")
  }
}
