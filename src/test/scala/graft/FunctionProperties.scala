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
}
