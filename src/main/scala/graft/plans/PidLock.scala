package graft.plans

import java.nio.file.{Files, Paths}

/** O7 pidfile mutual exclusion — same algorithm as the reference
  * (taskrabbit/forklift `lib/forklift/base/pid.rb:25-51`): a pidfile plus
  * a process-liveness check (the reference shells out to `ps -p`; here
  * `ProcessHandle.of(pid)`), with stale-file cleanup. */
object PidLock {
  def withLock[A](dir: String)(body: => A): A = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val pidfile = d.resolve("pid")
    if (Files.exists(pidfile)) {
      val pid = try new String(Files.readAllBytes(pidfile)).trim.toLong catch { case _: Exception => -1L }
      val alive = pid > 0 && ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      if (alive && pid != ProcessHandle.current().pid())
        throw new IllegalStateException(s"plan already running (pid $pid)")
      Files.deleteIfExists(pidfile) // stale cleanup, pid.rb:47-50
    }
    Files.write(pidfile, ProcessHandle.current().pid().toString.getBytes)
    try body
    finally Files.deleteIfExists(pidfile)
  }
}
