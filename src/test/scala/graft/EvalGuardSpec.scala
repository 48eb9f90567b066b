package graft

/** Single-class corpora through the registered ROC-family queries: a
  * language filter deployed on an already-filtered (all-'en') or
  * miss-everything (no-'en') corpus has no negative or no positive
  * class, and every ratio readout must NULL or empty out rather than
  * divide by zero — checked end-to-end on hand-built documents.parquet
  * fixtures, the InferenceGuardSpec discipline applied to Eval.
  */
class EvalGuardSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-evalguard").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def corpus(lang: String): Seq[(Long, String, String, String, Long)] =
    (0L until 30L).map { i =>
      val text = s"doc $i with the word and the filler et le der und el y text"
      (i, text, lang, s"s${i % 3}", text.length.toLong)
    }

  test("all-positive corpus: AUC and Youden NULL or empty, PR-AUC saturates") {
    val dir = docsDir(corpus("en"))
    val auc = SparkEntry.queries("q_auc_roc")(spark, dir).collect().head
    assert(auc.getAs[Long]("n_neg") == 0L)
    assert(auc.isNullAt(auc.fieldIndex("auc_q6")),
      "no negative class — AUC must be NULL, not a division by zero")
    val yj = SparkEntry.queries("q_youden_threshold")(spark, dir).collect()
    assert(yj.isEmpty, "Youden needs both classes; the readout must be empty")
    val ap = SparkEntry.queries("q_pr_auc")(spark, dir).collect().head
    assert(ap.getAs[Long]("prevalence_q6") == 1000000L)
    assert(ap.getAs[Long]("ap_q6") == 1000000L,
      "every prefix of an all-positive ranking has precision 1")
  }

  test("all-negative corpus: PR-AUC NULLs, AUC NULLs, lift/gain NULL per decile") {
    val dir = docsDir(corpus("de"))
    val auc = SparkEntry.queries("q_auc_roc")(spark, dir).collect().head
    assert(auc.getAs[Long]("n_pos") == 0L)
    assert(auc.isNullAt(auc.fieldIndex("auc_q6")))
    val ap = SparkEntry.queries("q_pr_auc")(spark, dir).collect().head
    assert(ap.isNullAt(ap.fieldIndex("ap_q6")),
      "no positive class — average precision must be NULL")
    val lg = SparkEntry.queries("q_lift_gain")(spark, dir).collect()
    assert(lg.nonEmpty)
    for (r <- lg) {
      assert(r.getAs[Long]("n_pos") == 0L)
      assert(r.isNullAt(r.fieldIndex("gain_q6")) && r.isNullAt(r.fieldIndex("lift_q6")),
        "zero positives must NULL gain and lift in every decile")
    }
    val cal = SparkEntry.queries("q_calibration_bins")(spark, dir).collect()
    for (r <- cal) assert(r.getAs[Long]("rate_q6") == 0L)
  }
}
