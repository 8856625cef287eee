package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Winnow

/** ScalaCheck laws for the native winnow_fps kernel: the rolling-hash +
  * window-min implementation is checked against a direct positional
  * recompute on random strings over a SMALL alphabet (small on purpose —
  * repeated characters make equal k-gram hashes common, exercising the
  * rightmost-tie and dedup paths that a natural-text fixture rarely hits).
  *
  * Pure driver-side: no SparkSession, hundreds of cases in milliseconds.
  */
object FunctionProperties extends Properties("graft.functions") {

  private val genCase: Gen[(String, Int, Int)] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    k <- Gen.choose(2, 8)
    w <- Gen.choose(2, 5)
  } yield (cs.mkString, k, w)

  private def reference(s: String, k: Int, w: Int): Set[(Long, Long)] =
    WinnowReference.fingerprints(s, k, w)

  private def kernel(s: String, k: Int, w: Int): Set[(Long, Long)] =
    Winnow.packed(UTF8String.fromString(s), k, w).toLongArray()
      .map(pk => (pk & 0xFFFFFFFFL, pk >>> 32)).toSet

  property("rolling kernel == positional reference (ties included)") =
    Prop.forAll(genCase) { case (s, k, w) =>
      kernel(s, k, w) == reference(s, k, w)
    }

  property("every w-window of k-gram positions contains a fingerprint") =
    Prop.forAll(genCase) { case (s, k, w) =>
      val nk = s.length - k + 1
      val sel = kernel(s, k, w).map(_._1)
      (nk < w) || (1 to nk - w + 1).forall(st =>
        (st until st + w).exists(p => sel.contains(p.toLong)))
    }

  // --- TopKState: the bounded buffer under l47's quota aggregate ---

  private val genTopK: Gen[(Int, List[(Long, Long)], Int)] = for {
    k <- Gen.choose(1, 6)
    n <- Gen.choose(0, 40)
    // Small value domain on purpose: ord ties are common, exercising the
    // (ord, id) tie-break shift path.
    ps <- Gen.listOfN(n, Gen.zip(
      Gen.choose(-5L, 5L), Gen.choose(0L, 9L)))
    cut <- Gen.choose(0, n)
  } yield (k, ps, cut)

  property("TopKState == sort-take reference (duplicates kept)") =
    Prop.forAll(genTopK) { case (k, ps, _) =>
      val st = new graft.functions.TopKState(k)
      ps.foreach { case (o, i) => st.insert(o, i) }
      val got = (0 until st.n).map(j => (st.ords(j), st.ids(j)))
      got == ps.sorted.take(k)
    }

  property("TopKState merge of a split == single-pass (partial-agg law)") =
    Prop.forAll(genTopK) { case (k, ps, cut) =>
      val (a, b) = ps.splitAt(cut)
      val sa = new graft.functions.TopKState(k)
      a.foreach { case (o, i) => sa.insert(o, i) }
      val sb = new graft.functions.TopKState(k)
      b.foreach { case (o, i) => sb.insert(o, i) }
      (0 until sb.n).foreach(j => sa.insert(sb.ords(j), sb.ids(j)))
      val got = (0 until sa.n).map(j => (sa.ords(j), sa.ids(j)))
      got == ps.sorted.take(k)
    }

  // --- FreqItemsAgg: the q84 heavy-hitters sketch under partitioning ---

  /** A stream with one PLANTED heavy key (~1/3 of the mass) over a long
    * tail, cut into random partitions: per-partition update → a
    * serialize/deserialize roundtrip (the shuffle path) → merges. The
    * sketch's guarantees must survive any split: the heavy key is in the
    * NO_FALSE_NEGATIVES list, its estimate is one-sided (est ≥ true,
    * est − true ≤ max_err), and the (lb, ub) interval brackets the truth.
    * Estimates themselves are order-dependent under purges — exactly why
    * q84 emits verdicts — so the law checks bounds, never exact values.
    */
  private val genFreq: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(50, 400)
    tail <- Gen.listOfN(n, Gen.choose(100L, 10000L))
    hot <- Gen.listOfN(n / 2, Gen.const(7L))
    cut <- Gen.choose(0, n + n / 2)
  } yield (scala.util.Random.javaRandomToRandom(
    new java.util.Random(n)).shuffle(tail ++ hot), cut)

  private def freqEval(stream: List[Long], cut: Int)
      : (Long, Map[Long, (Long, Long, Long)]) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = graft.functions.FreqItemsAgg(
      BoundReference(0, LongType, nullable = true), maxMapSize = 32)
    val (a, b) = stream.splitAt(cut)
    def build(part: List[Long]) =
      part.foldLeft(agg.createAggregationBuffer()) { (buf, v) =>
        agg.update(buf, InternalRow(v))
      }
    // Shuffle path: partial buffers serialize, deserialize, then merge.
    val merged = agg.merge(
      agg.deserialize(agg.serialize(build(a))),
      agg.deserialize(agg.serialize(build(b))))
    val row = agg.eval(merged).asInstanceOf[InternalRow]
    val arr = row.getArray(1)
    val items = (0 until arr.numElements()).map { i =>
      val st = arr.getStruct(i, 4)
      st.getLong(0) -> ((st.getLong(1), st.getLong(2), st.getLong(3)))
    }.toMap
    (row.getLong(0), items)
  }

  property("FreqItemsAgg: planted heavy key survives any split+merge " +
      "with one-sided bounded error") =
    Prop.forAll(genFreq) { case (stream, cut) =>
      val (maxErr, items) = freqEval(stream, cut)
      val truth = stream.count(_ == 7L).toLong
      items.get(7L).exists { case (est, lb, ub) =>
        est >= truth && est - truth <= maxErr &&
          lb <= truth && truth <= ub
      }
    }

  property("FreqItemsAgg: split point never breaks any emitted bound") =
    Prop.forAll(genFreq) { case (stream, cut) =>
      val (maxErr, items) = freqEval(stream, cut)
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
      items.forall { case (k, (est, lb, ub)) =>
        val truth = counts.getOrElse(k, 0L)
        est >= truth && est - truth <= maxErr &&
          lb <= truth && truth <= ub
      }
    }
}
