package graft

/** SQL-surface registration of the custom expressions. */
class RegisterSpec extends SparkSpec {

  test("custom expressions callable from spark.sql") {
    graft.functions.Register.all(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_simhash64(array('a', 'b')) AS s,
                size(graft_minhash_sig(array('x', 'y'), 8)) AS m,
                graft_parse_log_block('Amount: $1.50')['amount'] AS a
      """).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 8)
    assert(r.getString(3) == "$1.50")

    // aggregate registration: single-pass mode with pandas tie-break
    val m = spark.sql(
      """SELECT graft_mode(v) FROM
         VALUES ('b'), ('a'), ('b'), ('a'), ('c') AS t(v)""").collect()(0)
    assert(m.getString(0) == "a") // a and b tie at 2 → smallest wins

    // graft_top_k: per-group bounded top-k as an aggregate — the SQL
    // form of the ANN finisher (score desc, ties to smallest id)
    val t = spark.sql(
      """SELECT g, graft_top_k(s, id, 2) AS top FROM
         VALUES ('x', 3.0d, 1L), ('x', 5.0d, 2L), ('x', 5.0d, 3L),
                ('y', 1.0d, 9L)
         AS t(g, s, id) GROUP BY g ORDER BY g""").collect()
    val xTop = t(0).getSeq[org.apache.spark.sql.Row](1)
    assert(xTop.map(_.getLong(0)) == Seq(2L, 3L)) // 5.0 tie → ids asc
    assert(t(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      == Seq(9L))
  }
}
