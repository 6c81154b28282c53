package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** O7 pidfile mutual exclusion — same algorithm as the reference
  * (taskrabbit/forklift `lib/forklift/base/pid.rb:25-51`): a pidfile plus
  * a process-liveness check (the reference shells out to `ps -p`; here
  * `ProcessHandle.of(pid)`), with stale-file cleanup.
  *
  * Mostly race-safe: after stale cleanup the pidfile is created with
  * CREATE_NEW, so of two processes that both pass the liveness check only
  * one wins (the other gets FileAlreadyExistsException → "already
  * running"). Before deleting a stale file we re-read it and only delete
  * if it STILL holds the stale pid, so a competitor that already replaced
  * it with its own live pidfile is never unlocked by us. A write between
  * that re-read and the delete remains theoretically exposed (as in the
  * reference's check-then-act `pid.rb:41-51`); the CREATE_NEW gate keeps
  * the common interleavings single-winner. The finally-block deletes the
  * file only if it still holds OUR pid, so a loser can never remove a
  * winner's live pidfile.
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
      // Stale cleanup (pid.rb:47-50) — but only if the file still holds
      // the SAME stale pid we just checked; a competitor may have already
      // cleaned up and written its own live pidfile in the gap.
      val still = try new String(Files.readAllBytes(pidfile)).trim == pid.toString
                  catch { case _: Exception => false }
      if (still || pid == -1L) Files.deleteIfExists(pidfile)
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
