package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcPipeline

/** Pins the size-derived state-width law the stateful streaming
  * roundtrips size their shuffle partitions with. At every testdata
  * scale the FLOOR binds (sf1's events.parquet is ~16 MB), so the
  * growth arm — the part that matters at deployment scale — can only
  * be pinned arithmetically.
  */
class StatePartsSpec extends AnyFunSuite {

  test("floor binds below one growth step") {
    assert(CdcPipeline.statePartsForBytes(0L, 4) == 4)
    assert(CdcPipeline.statePartsForBytes(16L << 20, 4) == 4)
    assert(CdcPipeline.statePartsForBytes(16L << 20, 8) == 8)
  }

  test("one partition per 8 MB of feed once past the floor") {
    assert(CdcPipeline.statePartsForBytes(80L << 20, 4) == 10)
    assert(CdcPipeline.statePartsForBytes(128L << 20, 8) == 16)
  }

  test("capped at the session width (32)") {
    assert(CdcPipeline.statePartsForBytes(10L << 30, 4) == 32)
  }

  test("unreadable feed degrades to the floor, never to zero") {
    assert(CdcPipeline.statePartsFor("/nonexistent", 8) == 8)
  }

  test("the real testdata feeds all sit at the floor") {
    // the documented reason the width A/Bs read identical sides: the
    // sizing law is inert at test scale by construction
    assert(CdcPipeline.statePartsFor("/root/testdata/sf0.1", 4) == 4)
  }
}
