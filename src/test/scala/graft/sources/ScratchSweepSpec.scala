package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The roundtrip scratch hygiene contract: dead-pid roots are swept, live
  * ones (including this JVM's own) are left alone — the guard against the
  * per-call-UUID dirs accumulating in /tmp across crashed JVMs.
  */
class ScratchSweepSpec extends AnyFunSuite {

  test("sweepDeadPidRoots removes dead-pid roots, keeps live and foreign") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sweep_test").toFile
    def mk(name: String): java.io.File = {
      val d = new java.io.File(base, name)
      assert(new java.io.File(d, "x/y").mkdirs())
      java.nio.file.Files.writeString(
        new java.io.File(d, "x/y/f.txt").toPath, "junk")
      d
    }
    // A pid that cannot exist (beyond pid_max), this JVM's own pid, and a
    // name that does not match the p<digits> pattern.
    val dead = mk("p99999999")
    val live = mk(s"p${ProcessHandle.current().pid()}")
    val other = mk("not_a_pid_dir")
    FormatRoundtrip.sweepDeadPidRoots(base)
    assert(!dead.exists(), "dead-pid root should be deleted")
    assert(live.exists(), "live-pid root must survive")
    assert(other.exists(), "non-pid entries must survive")
    // cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(base)
  }
}
