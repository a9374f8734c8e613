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

/** [[graft.ops.TextOps.bm25TopK]] against an independent driver-side
  * reimplementation of the integer fixed-point arithmetic, over random
  * small corpora — the oracle pins two fixed corpora; this pins the
  * arithmetic itself. */
object Bm25Props extends Properties("Bm25FixedPoint") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "pad")
  private val corpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 15)
    texts <- Gen.listOfN(n, Gen.chooseNum(1, 12)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def reference(docs: List[(Long, String)],
      terms: Seq[String], k: Int): List[(Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val nTotal = toks.size.toLong
    val sumDl = toks.map(_._2.length.toLong).sum
    val avgdlM = sumDl * 1000 / nTotal
    val df = terms.map(q => q -> toks.count(_._2.contains(q)).toLong).toMap
    val scores = toks.flatMap { case (id, ts) =>
      val dl = ts.length.toLong
      val s = terms.map { q =>
        val tf = ts.count(_ == q).toLong
        if (tf == 0 || df(q) == 0) 0L
        else {
          val idfPpm = (2 * (nTotal - df(q)) + 1) * 1000000L / (2 * df(q) + 1)
          val normM = 250 + dl * 750 * 1000 / avgdlM
          val denomM = tf * 1000 + 1200 * normM / 1000
          val satPpm = tf * 2200 * 1000000L / denomM
          idfPpm * satPpm / 1000000L
        }
      }.sum
      if (s > 0) Some(id -> s) else None
    }
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  property("Spark == driver reimplementation, exact ppm, order and cut") =
    forAll(corpus) { docs =>
      import spark.implicits._
      val out = graft.ops.TextOps
        .bm25TopK(docs.toDF("doc_id", "text"), Seq("alpha", "gamma"), k = 5)
        .as[(Long, Long)].collect().toList
      out == reference(docs, Seq("alpha", "gamma"), 5)
    }
}

/** [[graft.ops.GraphOps.egoSubgraph]] against a driver-side BFS over
  * random small graphs: distances are exact shortest paths, the ball is
  * bounded by the hop budget. */
object EgoProps extends Properties("EgoSubgraph") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private val nodeIds = Vector("a", "b", "c", "d", "e", "f", "g", "h")
  private val graphAndHops: Gen[(List[(String, String)], Int)] = for {
    n <- Gen.chooseNum(1, 14)
    es <- Gen.listOfN(n, Gen.zip(Gen.oneOf(nodeIds), Gen.oneOf(nodeIds)))
    hops <- Gen.chooseNum(0, 4)
  } yield (es.filter(e => e._1 != e._2), hops)

  private def bfs(edges: List[(String, String)], seed: String,
      hops: Int): Map[String, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (k <- 1 to hops) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> k.toLong)
      frontier = next
    }
    dist
  }

  property("distances == driver BFS for arbitrary graphs and hop budgets") =
    forAll(graphAndHops) { case (es, hops) =>
      import spark.implicits._
      if (es.isEmpty) true
      else {
        val got = graft.ops.GraphOps
          .egoSubgraph(es.toDF("src", "tgt"), seed = "a", hops = hops)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        got == bfs(es, "a", hops)
      }
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
