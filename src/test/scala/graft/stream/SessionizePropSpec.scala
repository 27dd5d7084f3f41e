package graft.stream

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure per-group merge step behind the
  * streaming sessionizer ([[Sessionize.mergeStep]]) — no Spark session
  * needed, so hundreds of adversarial shapes run in milliseconds.
  *
  * The load-bearing law: folding mergeStep over ANY contiguous
  * event-time-ordered batch split (threading the open state, closing it
  * at the end) equals the one-shot batch sessionization of all events —
  * the streamed == batch contract the StreamingPipelineSpec pins
  * end-to-end for one fixture, pinned here across random gaps, ties,
  * bursts, and split points. Plus the conservation and separation laws
  * that hold even for ADVERSARIAL (non-ordered) splits, where
  * append-mode streaming cannot match the batch result exactly but must
  * never lose events or glue a session across a silence. */
class SessionizePropSpec extends AnyFunSuite {
  import Sessionize.SessionState

  /** One-shot reference: gap-merge sorted times on the driver. */
  private def reference(times: Seq[Long], gap: Long): List[SessionState] = {
    val sorted = times.sorted
    var out = List.empty[SessionState]
    var cur: SessionState = null
    sorted.foreach { t =>
      if (cur == null) cur = SessionState(t, t, 1)
      else if (t - cur.lastSeen <= gap)
        cur = SessionState(cur.start, t, cur.nEvents + 1)
      else { out ::= cur; cur = SessionState(t, t, 1) }
    }
    if (cur != null) out ::= cur
    out.reverse
  }

  private def foldBatches(batches: Seq[Seq[Long]], gap: Long)
      : List[SessionState] = {
    var state = Option.empty[SessionState]
    var closed = List.empty[SessionState]
    batches.foreach { b =>
      val (c, open) = Sessionize.mergeStep(state, b, gap)
      closed ++= c
      state = open
    }
    closed ++ state.toList
  }

  private val genCase = for {
    gap <- Gen.choose(1L, 50L)
    n <- Gen.choose(0, 60)
    // clustered times: bursts around anchors make both merges and
    // splits likely at any gap
    times <- Gen.listOfN(n, for {
      anchor <- Gen.choose(0L, 500L)
      jitter <- Gen.choose(0L, 20L)
    } yield anchor * 7 + jitter)
    nSplits <- Gen.choose(0, 6)
    splits <- Gen.listOfN(nSplits, Gen.choose(0, math.max(n, 1)))
  } yield (gap, times, splits.sorted)

  test("ordered batch splits replay the one-shot sessionization exactly") {
    (1 to 300).foreach { _ =>
      val (gap, times, splits) = genCase.sample.get
      val sorted = times.sorted
      val cuts = (0 +: splits :+ sorted.length).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) =>
        sorted.slice(a, b) }.filter(_.nonEmpty)
      assert(foldBatches(batches, gap) == reference(times, gap),
        s"gap=$gap times=$times splits=$splits")
    }
  }

  test("adversarial (unordered) splits conserve events and never glue " +
    "a session across a silence wider than the gap") {
    (1 to 300).foreach { _ =>
      val (gap, times, splits) = genCase.sample.get
      // shuffle deterministically by hash so batches violate order
      val shuffled = times.sortBy(t => (t * 2654435761L) % 1000003L)
      val cuts = (0 +: splits :+ shuffled.length).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) =>
        shuffled.slice(a, b) }.filter(_.nonEmpty)
      val out = foldBatches(batches, gap)
      assert(out.map(_.nEvents).sum == times.length,
        s"events lost/duplicated: gap=$gap times=$times")
      out.foreach { s =>
        assert(s.start <= s.lastSeen)
        // a session absorbed only events it saw; the widest legal span
        // for nEvents events is (nEvents - 1) * gap of pairwise maximal
        // gaps — anything wider glued across a silence
        assert(s.lastSeen - s.start <= (s.nEvents - 1) * gap,
          s"glued session $s at gap=$gap times=$times")
      }
    }
  }

  test("the regression case: a late event far below the open session " +
    "stays its own closed session") {
    val open = Some(SessionState(10000L, 10000L, 3))
    val (closed, next) = Sessionize.mergeStep(open, Seq(5000L), gapMillis = 100L)
    assert(closed == List(SessionState(5000L, 5000L, 1)))
    assert(next.contains(SessionState(10000L, 10000L, 3)))
    // and within the gap BELOW start it extends backwards instead
    val (c2, n2) = Sessionize.mergeStep(open, Seq(9950L), gapMillis = 100L)
    assert(c2.isEmpty && n2.contains(SessionState(9950L, 10000L, 4)))
    // and an old cluster BRIDGED into the session by a middle event
    // merges whole
    val (c3, n3) = Sessionize.mergeStep(open,
      Seq(9850L, 9930L), gapMillis = 100L)
    assert(c3.isEmpty && n3.contains(SessionState(9850L, 10000L, 5)))
  }
}
