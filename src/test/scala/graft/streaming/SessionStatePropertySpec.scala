package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

/** Property tests for the flatMapGroupsWithState session fold
  * (SURVEY.md §5.2): for ARBITRARY event-time multisets — including
  * duplicates and arbitrary micro-batch splits — the state function must
  * emit exactly the gap-closed sessions of the sorted stream, keep the
  * open session in state, and be split-invariant (same output no matter
  * how the stream is chopped into batches, as long as batches arrive in
  * time order). */
object SessionStatePropertySpec extends Properties("SessionFlatState") {

  private val GapUs = 6L * 3600 * 1000000

  // event times scattered so that some pairs exceed the 6h gap and some
  // don't; duplicates allowed
  private val genTimes: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 60)
    ts <- Gen.listOfN(n, Gen.chooseNum(0L, 80L).map(_ * (GapUs / 4)))
  } yield ts

  /** Reference: sort, split on gap, return (closed sessions, open). */
  private def referenceSessions(ts: Seq[Long]): (Seq[(Long, Long, Long)], (Long, Long, Long)) = {
    val sorted = ts.sorted
    val sessions = sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
      case (acc @ ((s0, last, n) :: rest), t) =>
        if (t - last > GapUs) (t, t, 1L) :: acc
        else (s0, t, n + 1) :: rest
      case (Nil, _) => Nil // unreachable: seeded with head
    }.reverse
    (sessions.init, sessions.last)
  }

  private def runBatches(batches: Seq[Seq[Long]]): (Seq[(Long, Long, Long)], Option[(Long, Long, Long)]) = {
    var stateOpt: Option[(Long, Long, Long)] = None
    val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    batches.filter(_.nonEmpty).foreach { b =>
      val st = TestGroupState.create[(Long, Long, Long)](
        stateOpt.map(Optional.of[(Long, Long, Long)]).getOrElse(Optional.empty()),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
      val out = StreamOps.sessionFlatState(useTimeout = false)(
        7L, b.map((7L, _)).iterator, st)
      closed ++= out.map(r => (r._2, r._3, r._4))
      stateOpt = if (st.exists) Some(st.get) else None
    }
    (closed.toSeq, stateOpt)
  }

  property("single batch emits the gap-closed sessions; open session stays in state") =
    forAll(genTimes) { ts =>
      val (closed, open) = runBatches(Seq(ts))
      val (refClosed, refOpen) = referenceSessions(ts)
      closed == refClosed && open.contains(refOpen)
    }

  property("time-ordered batch splits are fold-invariant") =
    forAll(genTimes, Gen.chooseNum(1, 5)) { (ts, nSplits) =>
      val sorted = ts.sorted
      val chunkSize = math.max(1, sorted.size / nSplits)
      val batches = sorted.grouped(chunkSize).toSeq
      val (closed, open) = runBatches(batches)
      val (refClosed, refOpen) = referenceSessions(ts)
      closed == refClosed && open.contains(refOpen)
    }
}
