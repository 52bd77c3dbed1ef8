package graft

import graft.ops.FeatureSelect

/** MI feature ranking — the information-theoretic anchors. */
class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  // label = parity; `copy` IS the label, `indep` is orthogonal,
  // `half` sees the label through a noisy channel
  lazy val df = (0 until 400).map { i =>
    // the flip pattern depends only on i/2, which is parity-balanced,
    // so `half` is a true binary symmetric channel at flip rate 1/4
    (i % 2, i % 2, (i / 2) % 2,
      if ((i / 2) % 4 == 0) 1 - i % 2 else i % 2)
  }.toDF("y", "copy", "indep", "half")

  lazy val ranked = FeatureSelect.mutualInfo(df,
    Seq("copy", "indep", "half"), "y")
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(5))).toMap

  test("a label-copy feature attains MI = H(Y) and su = 1") {
    val (nv, mi, su) = ranked("copy")
    assert(nv == 2)
    assert(math.abs(mi - math.log(2)) < 1e-6, s"mi $mi")
    assert(math.abs(su - 1.0) < 1e-6, s"su $su")
  }

  test("an independent feature scores (near) zero") {
    val (_, mi, su) = ranked("indep")
    assert(math.abs(mi) < 1e-6, s"mi $mi")
    assert(math.abs(su) < 1e-6, s"su $su")
  }

  test("a noisy channel ranks strictly between") {
    val (_, miH, _) = ranked("half")
    assert(miH > 1e-3 && miH < ranked("copy")._2,
      s"noisy-channel mi $miH")
    // closed form: binary symmetric channel at flip rate 1/4:
    // MI = ln2 - H(1/4) with H(p) = -p ln p - (1-p) ln (1-p)
    val h14 = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    assert(math.abs(miH - (math.log(2) - h14)) < 1e-6)
  }

  test("null categories participate as their own value") {
    val withNull = Seq((0, Some("a")), (0, None), (1, Some("b")),
      (1, None)).toDF("y", "f")
    val out = FeatureSelect.mutualInfo(withNull, Seq("f"), "y")
      .collect().head
    assert(out.getLong(1) == 3) // a, b, null
  }
}
