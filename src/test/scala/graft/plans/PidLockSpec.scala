package graft.plans

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** O7 pidfile mutual exclusion (`base/pid.rb:25-51`; reference spec
  * `spec/unit/misc/pid_spec.rb`). */
class PidLockSpec extends SparkSpec {

  test("lock acquires, runs body, and cleans up its own pidfile") {
    val dir = tmpDir("graft_pidlock_")
    var ran = false
    PidLock.withLock(dir) { ran = true }
    assert(ran)
    assert(!Files.exists(Paths.get(dir, "pid")))
  }

  test("live foreign pid blocks the lock (already running)") {
    val dir = tmpDir("graft_pidlock_")
    // pid 1 is init — always alive, never us
    Files.writeString(Paths.get(dir, "pid"), "1")
    val e = intercept[IllegalStateException] { PidLock.withLock(dir) { () } }
    assert(e.getMessage.contains("already running"))
    // the foreign pidfile must NOT have been deleted
    assert(Files.readString(Paths.get(dir, "pid")).trim == "1")
  }

  test("stale pidfile (dead pid) is cleaned up and the lock proceeds (pid.rb:47-50)") {
    val dir = tmpDir("graft_pidlock_")
    // a pid that cannot be alive: max pid space exceeded
    Files.writeString(Paths.get(dir, "pid"), "999999999")
    var ran = false
    PidLock.withLock(dir) { ran = true }
    assert(ran && !Files.exists(Paths.get(dir, "pid")))
  }

  test("garbage pidfile content is treated as stale") {
    val dir = tmpDir("graft_pidlock_")
    Files.writeString(Paths.get(dir, "pid"), "not-a-pid")
    var ran = false
    PidLock.withLock(dir) { ran = true }
    assert(ran)
  }

  test("lock releases on body exception") {
    val dir = tmpDir("graft_pidlock_")
    intercept[RuntimeException] { PidLock.withLock(dir) { throw new RuntimeException("x") } }
    assert(!Files.exists(Paths.get(dir, "pid")))
    // and a subsequent lock works
    PidLock.withLock(dir) { () }
  }
}
