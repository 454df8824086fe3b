package graft

import graft.cdc.Cursor
import org.scalatest.funsuite.AnyFunSuite

class CursorSpec extends AnyFunSuite {

  private def fresh(): Cursor =
    new Cursor(java.nio.file.Files.createTempDirectory("graft_cursor_")
      .resolve("cursor").toString)

  test("empty until first advance, then reads back what was written") {
    val c = fresh()
    assert(c.read().isEmpty)
    c.advance(1000L)
    assert(c.read().contains(1000L))
    c.advance(2000L)
    assert(c.read().contains(2000L))
  }

  test("refuses to move backwards (replay must not rewind the frontier)") {
    val c = fresh()
    c.advance(5000L)
    intercept[IllegalArgumentException](c.advance(4000L))
    assert(c.read().contains(5000L))
  }

  test("idempotent re-advance to the same position is allowed") {
    val c = fresh()
    c.advance(5000L)
    c.advance(5000L)
    assert(c.read().contains(5000L))
  }
}
