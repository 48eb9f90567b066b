package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: MERGE-INTO semantics (upsert + delete) as a
  * single keyed FULL OUTER join — the batch form of applying a CDC
  * changeset to a base snapshot (reference analog: the rebuild-don't-
  * mutate posture of `update_burst_epsg.py`, which recomputes affected
  * rows and rewrites, never updates in place).
  *
  * Scale posture: one sort-merge join on the merge key — the same shape
  * a lakehouse MERGE compiles to. The base side never needs a full
  * rewrite beyond the join output; with the base stored bucketed on the
  * key ([[Layout.writeBucketed]]) the base side of this join needs no
  * exchange at all, so applying a small changeset to a 100 TB base
  * shuffles only the changeset. AQE's skew split covers hot merge keys.
  */
object Cdc {

  val queries: Seq[QueryDef] = Seq(

    // Base snapshot = orders with key % 4 != 0 (an older load); changeset
    // = key % 3 == 0 rows, op D (delete) when key % 9 == 0 else U
    // (upsert, with a re-priced value). The merged output keeps
    // unmatched base rows, drops D keys, takes changeset values for U
    // keys, and inserts changeset keys absent from the base — each row
    // labeled with the action taken, the audit column a CDC apply emits.
    QueryDef.sql(
      "q_merge_upsert",
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders WHERE o_orderkey % 4 <> 0),
        |chg AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) + 1000 AS price_c,
        |    CASE WHEN o_orderkey % 9 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
        |  COALESCE(c.price_c, b.price_c) AS price_c,
        |  CASE WHEN c.o_orderkey IS NULL THEN 'kept'
        |       WHEN b.o_orderkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val base = orders.filter(pmod(col("o_orderkey"), lit(4)) =!= 0)
        .select(col("o_orderkey"), col("o_custkey").as("b_cust"),
          floor(col("o_totalprice") * 100).cast("long").as("b_price"))
      val chg = orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey").as("c_cust"),
          (floor(col("o_totalprice") * 100).cast("long") + 1000).as("c_price"),
          when(pmod(col("o_orderkey"), lit(9)) === 0, "D").otherwise("U").as("op"))
      base.join(chg, Seq("o_orderkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("o_orderkey"),
          coalesce(col("c_cust"), col("b_cust")).as("o_custkey"),
          coalesce(col("c_price"), col("b_price")).as("price_c"),
          when(col("op").isNull, "kept")
            .when(col("b_cust").isNull, "inserted")
            .otherwise("updated").as("action"))
        .orderBy(col("o_orderkey"))
    }
  )
}
