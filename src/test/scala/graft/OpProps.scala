package graft

import org.scalacheck.{Gen, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Algebraic invariants of the snapshot-delta operator
  * ([[graft.ops.DeltaOps.snapshotDelta]]): the delta IS the function that
  * turns the previous snapshot into the next one, over arbitrary
  * (duplicate-carrying) inputs. */
object DeltaProps extends Properties("SnapshotDelta") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // small id/value domains force heavy overlap, duplicates and empties
  private val twoSnapshots: Gen[(List[(Long, String)], List[(Long, String)])] =
    for {
      na <- Gen.chooseNum(0, 25)
      nb <- Gen.chooseNum(0, 25)
      a <- Gen.listOfN(na, Gen.zip(Gen.chooseNum(0L, 15L), Gen.oneOf("x", "y")))
      b <- Gen.listOfN(nb, Gen.zip(Gen.chooseNum(0L, 15L), Gen.oneOf("x", "y")))
    } yield (a, b)

  property("(prev − removes) ∪ adds == next, adds/removes disjoint from the other side") =
    forAll(twoSnapshots) { case (a, b) =>
      import spark.implicits._
      val d = graft.ops.DeltaOps
        .snapshotDelta(a.toDF("id", "v"), b.toDF("id", "v"))
        .as[(String, Long, String)].collect()
      val adds = d.collect { case ("add", id, v) => (id, v) }.toSet
      val removes = d.collect { case ("remove", id, v) => (id, v) }.toSet
      val pa = a.toSet
      val nx = b.toSet
      adds.subsetOf(nx) && removes.subsetOf(pa) &&
        ((pa -- removes) ++ adds) == nx &&
        adds.intersect(pa).isEmpty && removes.intersect(nx).isEmpty
    }
}

/** The blocking-recall guarantee of
  * [[graft.ops.ResolveOps.candidatePairs]]: with no block over the size
  * cap, length-banded double-emission blocking finds EXACTLY the
  * brute-force Levenshtein-≤-maxDist pair set — the `bandWidth > maxDist`
  * argument, property-proven over adversarial small-alphabet names. */
object ResolveProps extends Properties("ResolveBlocking") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // a 3-letter alphabet at lengths 1–7 makes near-pairs common
  private val nameList: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 14)
    ns <- Gen.listOfN(n, Gen.chooseNum(1, 7)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
  } yield ns

  property("candidates == brute lev<=2 pairs when no block overflows") =
    forAll(nameList) { names =>
      import spark.implicits._
      val got = graft.ops.ResolveOps.candidatePairs(names.toDF("name"))
        .as[(String, String, Long)].collect().toSet
      val distinct = names.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b && lev(a, b) <= 2
      } yield (a, b, lev(a, b).toLong)).toSet
      got == want
    }
}
