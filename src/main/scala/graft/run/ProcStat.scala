package graft.run

/** Process CPU accounting from /proc/self/stat — the user/sys split the
  * bench harness adjudicates CPU numbers with (user ≈ instruction work,
  * near-deterministic for an identical plan; sys carries the kernel's
  * IO-path work — page-cache copies, reclaim, fs metadata — which the
  * bench box inflates episodically; see BASELINE.md round-13 notes).
  * One definition shared by `graft.Bench` and `graft.tools.PrefixScale`
  * so a fix to the fiddly parsing (field offsets after the comm token,
  * the USER_HZ assumption) can never leave one caller producing
  * different seconds than the other.
  */
object ProcStat {
  /** (user seconds, sys seconds) of this process, or (0, 0) where
    * /proc is unavailable. utime/stime are fields 14/15 of
    * /proc/self/stat (1-based), i.e. indices 11/12 after splitting the
    * remainder past the parenthesized comm token; ticks are USER_HZ,
    * which Linux fixes at 100 for the userspace ABI. */
  def userSys(): (Double, Double) =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")))
      val f = s.substring(s.lastIndexOf(')') + 2).split(" ")
      (f(11).toDouble / 100.0, f(12).toDouble / 100.0)
    } catch { case _: Throwable => (0.0, 0.0) }
}
