package graft

import graft.ops.Associations

/** Frequent-pair association rules: exact counts, Apriori pruning,
  * basket-size guard, rule arithmetic.
  */
class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  def df(rows: (Long, String)*) = rows.toDF("bk", "it")

  test("pair counts, confidence, and lift on a hand-computed basket set") {
    // baskets: 1{a,b,c} 2{a,b} 3{a,c} 4{a}; duplicate (2,a) row must
    // dedupe. supports: a=4 b=2 c=2; pairs: ab=2 ac=2 bc=1
    val rules = Associations.rules(
      df((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "a"),
        (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a")),
      "bk", "it", minPctNum = 1L, minPctDen = 4L, maxBasket = 12)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rules.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rules(("a", "b"))
    assert(ab.getLong(2) == 4L && ab.getLong(3) == 2L &&
      ab.getLong(4) == 2L)
    assert(ab.getDouble(5) == 0.5)   // conf a→b = 2/4
    assert(ab.getDouble(6) == 1.0)   // conf b→a = 2/2
    assert(ab.getDouble(7) == 1.0)   // lift = 2·4/(4·2)
    val bc = rules(("b", "c"))
    assert(bc.getLong(4) == 1L && bc.getDouble(7) == 1.0)
  }

  test("oversized baskets are dropped and shrink the denominators") {
    // maxBasket=2 drops basket 1 (3 items): kept = 2{a,b} 3{a,c} 4{a}
    // → N=3, a=3 b=1 c=1, pairs ab=1 ac=1
    val rules = Associations.rules(
      df((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
        (3L, "a"), (3L, "c"), (4L, "a")),
      "bk", "it", minPctNum = 1L, minPctDen = 3L, maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rules.keySet == Set(("a", "b"), ("a", "c")))
    val ab = rules(("a", "b"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 1L)
    assert(ab.getDouble(7) == 1.0) // 1·3/(3·1)
  }

  test("support floor prunes infrequent pairs (Apriori property)") {
    // 10 baskets; {x,y} appears together once → 10% < 50% floor; {a,b}
    // co-occur in 6 → kept
    val rows = (1L to 6L).flatMap(i => Seq((i, "a"), (i, "b"))) ++
      Seq((7L, "x"), (7L, "y"), (8L, "a"), (9L, "b"), (10L, "a"))
    val rules = Associations.rules(rows.toDF("bk", "it"),
      "bk", "it", minPctNum = 1L, minPctDen = 2L, maxBasket = 12)
      .collect()
    assert(rules.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
  }
}
