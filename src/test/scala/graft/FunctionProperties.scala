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
}
