package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GraphOps

/** Hand-computed integer-PageRank contract: the fixed-point arithmetic is
  * part of the operator's public semantics (it is what makes the result
  * engine-exact), so the expected values below are worked by hand from the
  * definition in [[GraphOps.pageRank]]'s Scaladoc.
  */
class GraphOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def edges(pairs: (String, String)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "tgt")
  }

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("iterations=0 gives the uniform distribution, unit = scale div N") {
    val r = rankMap(GraphOps.pageRank(edges("a" -> "b", "b" -> "c"), iterations = 0))
    // N=3, unit = 10^12 div 3
    assert(r.keySet == Set("a", "b", "c"))
    assert(r.values.map(_._2).toSet == Set(333333333333L))
    assert(r("b")._1 == 2 && r("a")._1 == 1 && r("c")._1 == 1)
  }

  test("symmetric graph: all ranks stay equal; mass is conserved to truncation") {
    // triangle: deg 2 everywhere. r1 = 49999999999 + (85 * 333333333332) div 100
    val r = rankMap(GraphOps.pageRank(
      edges("a" -> "b", "a" -> "c", "b" -> "c"), iterations = 3))
    assert(r.values.map(_._2).toSet.size == 1)
    val total = r.values.map(_._2).sum
    assert(total <= 1000000000000L && total > 999999999000L,
      s"mass not conserved: $total")
  }

  test("path graph a-b-c after one iteration matches the hand calculation") {
    val r = rankMap(GraphOps.pageRank(edges("a" -> "b", "b" -> "c"), iterations = 1))
    // unit = 333333333333, base = (15 * unit) div 100 = 49999999999
    // contrib(a) = r(b) div 2 = 166666666666
    //   r1(a) = base + (85 * 166666666666) div 100 = 49999999999 + 141666666666
    // contrib(b) = r(a) + r(c) = 666666666666
    //   r1(b) = base + (85 * 666666666666) div 100 = 49999999999 + 566666666666
    assert(r("a")._2 == 191666666665L)
    assert(r("c")._2 == 191666666665L)
    assert(r("b")._2 == 616666666665L)
  }

  test("hugeGraph (shuffle-join Pregel) path is bit-identical to the broadcast path") {
    val es = edges("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "d", "d" -> "e")
    val small = rankMap(GraphOps.pageRank(es, iterations = 3))
    val huge = rankMap(GraphOps.pageRank(es, iterations = 3, hugeGraph = true))
    assert(small == huge)
  }

  test("topNeighbors: weight order, deterministic ties, k cut, symmetrized") {
    val s = spark
    import s.implicits._
    val es = Seq(("a", "b", 5L), ("a", "c", 5L), ("a", "d", 9L), ("b", "c", 1L))
      .toDF("src", "tgt", "n_docs")
    val top = GraphOps.topNeighbors(es, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byNode = top.groupBy(_._1)
    // a: d(9) first, then the 5-5 tie breaks to b over c; k=2 drops c
    assert(byNode("a").sortBy(_._4).toSeq ==
      Seq(("a", "d", 9L, 1L), ("a", "b", 5L, 2L)))
    // d has exactly one (symmetrized) neighbor
    assert(byNode("d").toSeq == Seq(("d", "a", 9L, 1L)))
    // b sees both a (5) and c (1), in weight order
    assert(byNode("b").sortBy(_._4).map(_._2).toSeq == Seq("a", "c"))
  }

  test("pmiEdges: hand-computed lift, exact truncation, count carry-through") {
    val s = spark
    import s.implicits._
    // docs: d1{a,b} d2{a,b} d3{a,c} d4{b} -> df a=3 b=3 c=1, N=4
    val mentions = Seq(
      ("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"),
      ("d3", "a"), ("d3", "c"), ("d4", "b")).toDF("doc_id", "curie")
    val es = Seq(("a", "b", 2L), ("a", "c", 1L)).toDF("src", "tgt", "n_docs")
    val out = GraphOps.pmiEdges(es, mentions).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // lift(a,b) = 2*4*1e6 div 9 = 888888 (sub-unit: hub pair, PMI < 0)
    assert(out(("a", "b")) == ((2L, 3L, 3L, 4L, 888888L)))
    // lift(a,c) = 1*4*1e6 div 3 = 1333333 (> 1e6: positive association)
    assert(out(("a", "c")) == ((1L, 3L, 1L, 4L, 1333333L)))
  }

  test("triangleSupport: hand-computed common counts, union, fixed-point jaccard") {
    val s = spark
    import s.implicits._
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")).toDF("src", "tgt")
    val out = GraphOps.triangleSupport(es).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // (a,b): common {c}; deg a=2 b=3; union = 1+2-1 = 2 -> 500000
    assert(out(("a", "b")) == ((1L, 2L, 3L, 2L, 500000L)))
    // (a,c): common {b}; union = 1+1-1 = 1 -> 1000000
    assert(out(("a", "c")) == ((1L, 2L, 2L, 1L, 1000000L)))
    // (b,d): no common; union = 2+0-0 = 2 -> 0
    assert(out(("b", "d")) == ((0L, 3L, 1L, 2L, 0L)))
  }

  test("triangleSupport: hugeGraph (no broadcast hints) == broadcast path") {
    val s = spark
    import s.implicits._
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"))
      .toDF("src", "tgt")
    val bc = GraphOps.triangleSupport(es).collect().map(_.toSeq).toSet
    val open = GraphOps.triangleSupport(es, hugeGraph = true).collect()
      .map(_.toSeq).toSet
    assert(open == bc)
  }

  test("pmiEdges: hugeGraph (shuffled df joins) == broadcast path") {
    val s = spark
    import s.implicits._
    val es = Seq(("a", "b", 2L), ("a", "c", 1L)).toDF("src", "tgt", "n_docs")
    val mentions = Seq(("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"),
      ("d3", "a"), ("d3", "c"), ("d4", "b")).toDF("doc_id", "curie")
    val bc = GraphOps.pmiEdges(es, mentions).collect().map(_.toSeq).toSet
    val open = GraphOps.pmiEdges(es, mentions, hugeGraph = true).collect()
      .map(_.toSeq).toSet
    assert(open == bc)
  }

  test("triangleSupport: isolated edge has empty union and jaccard 0") {
    val s = spark
    import s.implicits._
    val out = GraphOps.triangleSupport(Seq(("x", "y")).toDF("src", "tgt"))
      .collect().map(r => (r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq((0L, 0L)))
  }

  test("components: two string-keyed clusters labeled by their min id") {
    // small string-keyed set: exercises the string union-find fast path
    // (ComponentsSpec-equality with the distributed rounds is in OpsSpec)
    val out = GraphOps.components(
        edges("b" -> "c", "c" -> "d", "x" -> "y"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("b" -> "b", "c" -> "b", "d" -> "b", "x" -> "x", "y" -> "x"))
  }

  test("components composed with topNeighbors(k=1) keeps every incident node") {
    val s = spark
    import s.implicits._
    // a-b strong pair, c-d strong pair, weak a-c bridge is cut by k=1
    val es = Seq(("a", "b", 9L), ("c", "d", 9L), ("a", "c", 1L))
      .toDF("src", "tgt", "n_docs")
    val top1 = GraphOps.topNeighbors(es, k = 1)
    val out = GraphOps.components(top1, srcCol = "node", tgtCol = "neighbor")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "c"))
  }

  test("egoSubgraph: exact hop distances on a path, ball bounded by hops") {
    val path = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val out = GraphOps.egoSubgraph(path, seed = "a", hops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("egoSubgraph: a cycle's far side is reached by the shorter arc") {
    val cyc = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val out = GraphOps.egoSubgraph(cyc, seed = "a", hops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 1L, "d" -> 1L, "c" -> 2L))
  }

  test("egoSubgraph: unknown seed yields just the seed at distance 0") {
    val out = GraphOps.egoSubgraph(edges("x" -> "y"), seed = "z", hops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("z" -> 0L))
  }

  test("personalized PageRank: teleport mass confined to the seed, hand-computed") {
    // path a-b-c, seed {a}: n=1, unit=1e12, base(a)=15e12 div 100
    // iter1: contrib(b) = rank(a) div deg(a) = 1e12; contrib(a)=contrib(c)=0
    val r = rankMap(GraphOps.pageRank(edges("a" -> "b", "b" -> "c"),
      iterations = 1, seeds = Seq("a")))
    assert(r("a")._2 == 150000000000L)
    assert(r("b")._2 == 850000000000L)
    assert(r("c")._2 == 0L)
    // seeds = all nodes degenerates to uniform PageRank
    val uni = rankMap(GraphOps.pageRank(edges("a" -> "b", "b" -> "c"), iterations = 2))
    val all = rankMap(GraphOps.pageRank(edges("a" -> "b", "b" -> "c"),
      iterations = 2, seeds = Seq("a", "b", "c")))
    assert(uni == all)
  }

  test("personalized PageRank: absent seed degrades to zero mass, no crash") {
    // ANSI mode would otherwise kill the job with DIVIDE_BY_ZERO on
    // unit = scale div 0 (the egoSubgraph unknown-seed analogue)
    val r = rankMap(GraphOps.pageRank(edges("a" -> "b"),
      iterations = 2, seeds = Seq("nowhere")))
    assert(r.keySet == Set("a", "b"))
    assert(r.values.map(_._2).toSet == Set(0L))
  }

  test("hub node outranks leaves") {
    val star = edges("hub" -> "l1", "hub" -> "l2", "hub" -> "l3", "hub" -> "l4")
    val r = rankMap(GraphOps.pageRank(star, iterations = 3))
    assert(r("hub")._2 > r("l1")._2)
    assert(Set("l1", "l2", "l3", "l4").map(r(_)._2).size == 1)
  }
}
