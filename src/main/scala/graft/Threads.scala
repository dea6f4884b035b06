package graft

/** Join-until-dead with interrupt-each-lap and caller-interrupt
  * restoration — the close() discipline shared by every daemon-thread
  * owner (Serve.Handle's updater, Serve.ConfHandle's puller,
  * HttpDashboard's sampler): the caller's guarantee ("no work after
  * close() returns") is absolute, so a thread stuck in
  * non-interruptible I/O is waited out, re-interrupting each lap (FS
  * clients routinely swallow the first interrupt); an interrupted
  * CALLER keeps waiting — returning early would break the guarantee and
  * leak whatever the thread still holds — and has its own interrupt
  * flag restored afterwards. */
private[graft] object Threads {
  def joinUntilDead(t: Thread, lapMillis: Long = 30000L): Unit = {
    var callerInterrupted = false
    while (t.isAlive) {
      t.interrupt()
      try t.join(lapMillis)
      catch { case _: InterruptedException => callerInterrupted = true }
    }
    if (callerInterrupted) Thread.currentThread().interrupt()
  }
}
