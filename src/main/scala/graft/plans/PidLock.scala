package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** O7 pidfile mutual exclusion — same algorithm as the reference
  * (taskrabbit/forklift `lib/forklift/base/pid.rb:25-51`): a pidfile plus
  * a process-liveness check (the reference shells out to `ps -p`; here
  * `ProcessHandle.of(pid)`), with stale-file cleanup.
  *
  * Race-safe: after stale cleanup the pidfile is created with CREATE_NEW,
  * so of two processes that both pass the liveness check only one wins
  * (the other gets FileAlreadyExistsException → "already running"). The
  * finally-block deletes the file only if it still holds OUR pid, so a
  * loser can never remove a winner's live pidfile.
  */
object PidLock {
  def withLock[A](dir: String)(body: => A): A = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val pidfile = d.resolve("pid")
    val myPid = ProcessHandle.current().pid()
    if (Files.exists(pidfile)) {
      val pid = try new String(Files.readAllBytes(pidfile)).trim.toLong catch { case _: Exception => -1L }
      val alive = pid > 0 && ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      if (alive && pid != myPid)
        throw new IllegalStateException(s"plan already running (pid $pid)")
      Files.deleteIfExists(pidfile) // stale cleanup, pid.rb:47-50
    }
    try
      Files.write(pidfile, myPid.toString.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val holder = try new String(Files.readAllBytes(pidfile)).trim catch { case _: Exception => "?" }
        throw new IllegalStateException(s"plan already running (pid $holder)")
    }
    try body
    finally {
      // delete only if the file is still ours — never a successor's lock
      val mine = try new String(Files.readAllBytes(pidfile)).trim == myPid.toString
                 catch { case _: Exception => false }
      if (mine) Files.deleteIfExists(pidfile)
    }
  }
}
