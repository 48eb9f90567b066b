package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation readouts over the corpus (the family NDCG@10 started):
  * threshold-free ranking quality (AUC-ROC) and classification quality
  * (confusion matrix with per-class precision/recall/F1) for the
  * q_text_langid heuristic classifier — the eval loop a training-data
  * pipeline runs against its own filters.
  *
  * AUC is computed through the Mann-Whitney identity AUC = U/(n₀·n₁)
  * (q_mann_whitney's doubled-mid-rank histogram machinery verbatim), so
  * it is exact under ties and never sorts raw rows — the rank window
  * runs over the bounded score histogram. All ratios are integer q6
  * (`(x*10⁶) div y` on nonneg integers — identical in both engines).
  *
  * Scale posture: one pass over documents computes the per-doc scores
  * (pure string expressions, no shuffle), then combiner groupBys onto
  * the score histogram / class-pair matrix, both bounded by the score
  * domain resp. the class-label vocabulary, not the corpus.
  */
object Eval {

  /** The q_text_langid stopword-hit scorer (`TextPipeline.scala:818`):
    * (s_en, s_de, s_fr, s_es) hit counts over the padded lowercase text. */
  private def scored(df: org.apache.spark.sql.DataFrame) = {
    def occ(p: Column, kw: String): Column =
      ((length(p) - length(expr(s"replace(p, '$kw', '')"))) / kw.length).cast("long")
    df.select(col("doc_id"), col("lang"),
        concat(lit(" "), lower(col("text")), lit(" ")).as("p"))
      .select(col("doc_id"), col("lang"),
        (occ(col("p"), " the ") + occ(col("p"), " and ")).as("s_en"),
        (occ(col("p"), " der ") + occ(col("p"), " und ")).as("s_de"),
        (occ(col("p"), " le ") + occ(col("p"), " et ")).as("s_fr"),
        (occ(col("p"), " el ") + occ(col("p"), " y ")).as("s_es"))
  }

  private val scoredSql =
    """scored AS (
      |  SELECT doc_id, lang,
      |    CAST((LENGTH(p) - LENGTH(REPLACE(p, ' the ', ''))) / 5
      |       + (LENGTH(p) - LENGTH(REPLACE(p, ' and ', ''))) / 5 AS BIGINT) AS s_en,
      |    CAST((LENGTH(p) - LENGTH(REPLACE(p, ' der ', ''))) / 5
      |       + (LENGTH(p) - LENGTH(REPLACE(p, ' und ', ''))) / 5 AS BIGINT) AS s_de,
      |    CAST((LENGTH(p) - LENGTH(REPLACE(p, ' le ', ''))) / 4
      |       + (LENGTH(p) - LENGTH(REPLACE(p, ' et ', ''))) / 4 AS BIGINT) AS s_fr,
      |    CAST((LENGTH(p) - LENGTH(REPLACE(p, ' el ', ''))) / 4
      |       + (LENGTH(p) - LENGTH(REPLACE(p, ' y ', ''))) / 3 AS BIGINT) AS s_es
      |  FROM (SELECT doc_id, lang, ' ' || LOWER(text) || ' ' AS p FROM documents) x)""".stripMargin

  private val predSql =
    """pred AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'unknown'
      |         WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
      |         WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
      |         WHEN s_fr >= s_es THEN 'fr'
      |         ELSE 'es' END AS pred_lang
      |  FROM scored)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // AUC-ROC of the English-ness score s_en against the lang column:
    // AUC = U/(n0·n1) through the doubled-mid-rank histogram, exact
    // under ties (a tied positive/negative pair contributes exactly 1/2,
    // which is why U is carried x2). A score that beats random must land
    // well above 500000.
    QueryDef.sql(
      "q_auc_roc",
      s"""WITH $scoredSql,
         |hist AS (
         |  SELECT s_en AS sc,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS c0,
         |    CAST(COUNT(*) AS BIGINT) AS t
         |  FROM scored GROUP BY s_en),
         |rk AS (
         |  SELECT c0, c1, t,
         |    SUM(t) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - t AS cumb
         |  FROM hist),
         |agg AS (
         |  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c1 * (2 * cumb + t + 1)) AS BIGINT) AS r2
         |  FROM rk)
         |SELECT n1 AS n_pos, n0 AS n_neg,
         |  r2 - n1 * (n1 + 1) AS u_x2,
         |  CASE WHEN n0 = 0 OR n1 = 0 THEN NULL
         |    ELSE ((r2 - n1 * (n1 + 1)) * 500000) // (n0 * n1) END AS auc_q6
         |FROM agg""".stripMargin) { (s, d) =>
      val hist = scored(Tables.documents(s, d))
        .groupBy(col("s_en").as("sc"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c1"),
          sum(when(col("lang") === "en", 0L).otherwise(1L)).as("c0"),
          count(lit(1)).as("t"))
      // domain-bounded window: one row per distinct stopword-hit count
      val w = Window.orderBy(col("sc")).rowsBetween(Window.unboundedPreceding, 0)
      val rk = hist.select(col("c0"), col("c1"), col("t"),
        (sum(col("t")).over(w) - col("t")).as("cumb"))
      rk.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
          sum(col("c1") * (lit(2) * col("cumb") + col("t") + 1)).as("r2"))
        .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
          (col("r2") - col("n1") * (col("n1") + 1)).as("u_x2"),
          when(col("n0") === 0 || col("n1") === 0, lit(null))
            .otherwise(expr("((r2 - n1 * (n1 + 1)) * 500000) div (n0 * n1)"))
            .as("auc_q6"))
    },

    // Per-class precision/recall/F1 of the langid classifier against the
    // lang column. tp/fp/fn come from one (actual, predicted) combiner
    // matrix (bounded by the label vocabulary squared); F1 is the
    // harmonic mean computed on q6 integers so both engines agree
    // bit-for-bit. Classes the classifier never predicts (fp = tp = 0)
    // report precision NULL, the standard undefined case.
    QueryDef.sql(
      "q_langid_confusion",
      s"""WITH $scoredSql,
         |$predSql,
         |cm AS (
         |  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM pred GROUP BY lang, pred_lang),
         |cls AS (
         |  SELECT lang AS cls FROM cm
         |  UNION SELECT pred_lang AS cls FROM cm),
         |m AS (
         |  SELECT cls.cls,
         |    COALESCE((SELECT SUM(c) FROM cm WHERE cm.lang = cls.cls
         |              AND cm.pred_lang = cls.cls), 0) AS tp,
         |    COALESCE((SELECT SUM(c) FROM cm WHERE cm.pred_lang = cls.cls
         |              AND cm.lang <> cls.cls), 0) AS fp,
         |    COALESCE((SELECT SUM(c) FROM cm WHERE cm.lang = cls.cls
         |              AND cm.pred_lang <> cls.cls), 0) AS fn
         |  FROM cls)
         |SELECT cls AS class, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |    ELSE (tp * 1000000) // (tp + fp) END AS precision_q6,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |    ELSE (tp * 1000000) // (tp + fn) END AS recall_q6,
         |  CASE WHEN tp + fp = 0 OR tp + fn = 0
         |      OR (tp * 1000000) // (tp + fp) + (tp * 1000000) // (tp + fn) = 0 THEN NULL
         |    ELSE (2 * ((tp * 1000000) // (tp + fp)) * ((tp * 1000000) // (tp + fn)))
         |      // ((tp * 1000000) // (tp + fp) + (tp * 1000000) // (tp + fn)) END AS f1_q6
         |FROM m ORDER BY class""".stripMargin) { (s, d) =>
      val pred = scored(Tables.documents(s, d))
        .withColumn("pred_lang",
          when(col("s_en") + col("s_de") + col("s_fr") + col("s_es") === 0, "unknown")
            .when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es")), "en")
            .when(col("s_de") >= greatest(col("s_fr"), col("s_es")), "de")
            .when(col("s_fr") >= col("s_es"), "fr")
            .otherwise("es"))
      val cm = pred.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("c")).localCheckpoint(true)
      val cls = cm.select(col("lang").as("class"))
        .union(cm.select(col("pred_lang").as("class"))).distinct()
      val tp = cm.filter(col("lang") === col("pred_lang"))
        .select(col("lang").as("class"), col("c").as("tp"))
      val fp = cm.filter(col("lang") =!= col("pred_lang"))
        .groupBy(col("pred_lang").as("class")).agg(sum(col("c")).as("fp"))
      val fn = cm.filter(col("lang") =!= col("pred_lang"))
        .groupBy(col("lang").as("class")).agg(sum(col("c")).as("fn"))
      val m = cls.join(tp, Seq("class"), "left")
        .join(fp, Seq("class"), "left")
        .join(fn, Seq("class"), "left")
        .select(col("class"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("fp"), lit(0L)).as("fp"),
          coalesce(col("fn"), lit(0L)).as("fn"))
      val p = expr("(tp * 1000000) div (tp + fp)")
      val r = expr("(tp * 1000000) div (tp + fn)")
      m.select(col("class"), col("tp"), col("fp"), col("fn"),
          when(col("tp") + col("fp") === 0, lit(null)).otherwise(p).as("precision_q6"),
          when(col("tp") + col("fn") === 0, lit(null)).otherwise(r).as("recall_q6"),
          when(col("tp") + col("fp") === 0 || col("tp") + col("fn") === 0 ||
            p + r === 0, lit(null))
            .otherwise(expr(
              "(2 * ((tp * 1000000) div (tp + fp)) * ((tp * 1000000) div (tp + fn)))" +
                " div ((tp * 1000000) div (tp + fp) + (tp * 1000000) div (tp + fn))"))
            .as("f1_q6"))
        .orderBy(col("class"))
    }
  )
}
