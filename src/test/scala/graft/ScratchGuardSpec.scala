package graft

import org.scalatest.funsuite.AnyFunSuite

/** The RAM-backed-scratch free-space budget (r12 verdict #2): a tmpfs
  * scratch root is only used while it still offers
  * [[Tables.MinScratchFreeBytes]] usable bytes; below the line, new
  * scratch dirs fall back to the disk-backed default tmpdir instead of
  * competing with executor memory (or hitting tmpfs ENOSPC). */
class ScratchGuardSpec extends AnyFunSuite {

  test("a root with ample free space passes through the guard") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_guard_ok_")
    try {
      // the default tmpdir's filesystem has >> budget free on any CI box
      assert(Tables.guardedScratchRoot(Some(tmp)).contains(tmp))
    } finally { java.nio.file.Files.delete(tmp); () }
  }

  test("a root below the free-space budget is rejected (tmpdir fallback)") {
    // /proc is a pseudo-fs whose file store reports 0 usable bytes —
    // a deterministic stand-in for a full tmpfs
    val full = java.nio.file.Paths.get("/proc")
    assume(Tables.usableBytes(full) < Tables.MinScratchFreeBytes)
    assert(Tables.guardedScratchRoot(Some(full)).isEmpty)
  }

  test("no configured root stays a no-op") {
    assert(Tables.guardedScratchRoot(None).isEmpty)
  }
}
