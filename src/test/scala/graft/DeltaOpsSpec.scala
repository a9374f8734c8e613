package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DeltaOps

class DeltaOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("snapshotDelta tags adds and removes; unchanged rows are dropped") {
    val s = spark
    import s.implicits._
    val prev = Seq(("n1", "x"), ("n2", "x"), ("gone", "y")).toDF("id", "label")
    val next = Seq(("n1", "x"), ("n2", "x"), ("new", "z")).toDF("id", "label")
    val out = DeltaOps.snapshotDelta(prev, next).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(("add", "new", "z"), ("remove", "gone", "y")))
  }

  test("snapshots are compared as sets: input duplicates don't leak") {
    val s = spark
    import s.implicits._
    val prev = Seq("a", "a", "b").toDF("id")
    val next = Seq("b", "b", "b").toDF("id")
    val out = DeltaOps.snapshotDelta(prev, next).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("remove", "a")))
  }

  test("null-safe equality: a null-valued row is a set member, not unknown") {
    val s = spark
    import s.implicits._
    val prev = Seq(("k", Option.empty[String])).toDF("id", "v")
    val next = Seq(("k", Option.empty[String])).toDF("id", "v")
    assert(DeltaOps.snapshotDelta(prev, next).isEmpty)
  }

  test("identical snapshots produce an empty delta (idempotent unit)") {
    val s = spark
    import s.implicits._
    val snap = Seq(("a", 1L), ("b", 2L)).toDF("id", "n")
    assert(DeltaOps.snapshotDelta(snap, snap).isEmpty)
  }

  test("contract knobs preserve the result on distinct non-null snapshots") {
    val s = spark
    import s.implicits._
    val prev = Seq(("n1", "x"), ("gone", "y")).toDF("id", "label")
    val next = Seq(("n1", "x"), ("new", "z")).toDF("id", "label")
    val base = DeltaOps.snapshotDelta(prev, next).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val fast = DeltaOps.snapshotDelta(prev, next,
        assumeDistinct = true, nullSafe = false).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(base == fast)
    assert(base == Set(("add", "new", "z"), ("remove", "gone", "y")))
  }

  test("mismatched schemas are rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      DeltaOps.snapshotDelta(Seq("a").toDF("id"), Seq("a").toDF("other"))
    }
  }
}
