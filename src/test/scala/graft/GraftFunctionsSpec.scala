package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft kernels callable from pure SQL (the reference's spark.sql-over-
  * a-fetched-file workflow can use the native Expressions directly). */
class GraftFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("scalar kernels resolve and compute through spark.sql") {
    graft.plans.GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT
        |  round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cos_same,
        |  round(graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) AS cos_orth,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
        |  size(graft_char_shingle_hashes('abcd', 3)) AS n_grams,
        |  graft_simhash64(array('a', 'b')) AS sh,
        |  size(graft_minhash_sig(array(7L, 9L), 16)) AS n_sig,
        |  graft_rolling_fingerprint('the quick brown fox jumps') AS fp
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.5)
    assert(r.getInt(3) == 2)      // 'abc', 'bcd'
    assert(r.getInt(5) == 16)
  }

  test("SQL kernels agree with the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.install(spark)
    val docs = Tables.documents(spark, sf).limit(50)
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(graft_tokens) AS sig FROM (" +
        "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS graft_tokens " +
        "FROM gf_docs)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = graft.operators.Dedup
      .simhashSignatures(docs, $"text", $"doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("misra_gries works as a SQL aggregate") {
    graft.plans.GraftFunctions.install(spark)
    val rows = spark.sql(
      """SELECT explode(graft_misra_gries(item, 4)) AS c FROM (
        |  SELECT explode(array('a','a','a','b','b','c','d','e')) AS item)
        |""".stripMargin)
      .selectExpr("c.item", "c.count_lb").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size <= 4)
    assert(rows.contains("a")) // count 3 > n/(k+1) = 8/5
  }
}
