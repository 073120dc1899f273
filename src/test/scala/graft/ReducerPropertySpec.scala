package graft

import graft.model.{CdcColumns => C}
import graft.operators.ChangeLogReducer
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style invariant (SURVEY.md §5.2): for random I/U/D event logs,
  * the distributed set-based reduction equals a naive sequential replay
  * (the reference's row-at-a-time semantics, src/postgres/
  * postgres_operator_impl.rs:292-401). Seeded generators keep runs
  * reproducible.
  */
class ReducerPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveReplay(events: Seq[(String, Long, String)])
      : Map[Long, String] =
    events.foldLeft(Map.empty[Long, String]) {
      case (state, (op, key, value)) =>
        op match {
          case "D" => state - key
          case _   => state.updated(key, value) // I and U both upsert
        }
    }

  test("NULL Op survives as insert (schema-drifted files)") {
    // a file written without the Op column yields NULL after mergeSchema;
    // such rows must behave like inserts, not be dropped by the D-filter
    val log = Seq(
      (Some("I"), 1L, "a", 0L),
      (None: Option[String], 2L, "b", 1L), // drifted: no Op
      (Some("D"), 1L, "a", 2L))
      .toDF(C.Op, "id", "value", "seq")
    val got = ChangeLogReducer.reduce(log, Seq("id"), struct(col("seq")))
      .select("id", "value").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet === Set((2L, "b"))) // key 1 deleted, NULL-Op key kept
    val gotW = ChangeLogReducer
      .reduceViaMaxBy(log, Seq("id"), struct(col("seq")))
      .select("id", "value").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(gotW.toSet === Set((2L, "b")))
  }

  test("reduce == naive sequential replay on random event logs") {
    val rnd = new Random(42)
    for (iter <- 1 to 15) {
      val nKeys = 1 + rnd.nextInt(30)
      val nEvents = 1 + rnd.nextInt(300)
      val events = (0 until nEvents).map { i =>
        val op = rnd.nextInt(4) match {
          case 0 => "D"
          case 1 => "U"
          case _ => "I"
        }
        (op, rnd.nextInt(nKeys).toLong, s"v${rnd.nextInt(1000)}")
      }
      val expected = naiveReplay(events)

      val log = events.zipWithIndex
        .map { case ((op, k, v), i) => (op, k, v, i.toLong) }
        .toDF(C.Op, "id", "value", "seq")
        .repartition(4) // scramble physical order; seq must restore it
      val got = ChangeLogReducer
        .reduce(log, Seq("id"), struct(col("seq")))
        .select("id", "value").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expected, s"iteration $iter (events=$nEvents)")

      val gotW = ChangeLogReducer
        .reduceViaMaxBy(log, Seq("id"), struct(col("seq")))
        .select("id", "value").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(gotW === expected, s"max_by variant, iteration $iter")
    }
  }

  test("historyMerge == full-replay history on random logs and cutoffs") {
    // the incremental-SCD2 invariant: for ANY event log split at ANY
    // point (the merge contract's ingest-order regime), stored history +
    // cursor folded with the tail batch equals rebuilding from scratch —
    // including version ordinals across arbitrary tombstone runs
    val rnd = new Random(4242)
    val histCols = Seq("id", "version", "value", "valid_from", "valid_to",
      "is_current")
    for (iter <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(12)
      val nEvents = 2 + rnd.nextInt(200)
      val events = (0 until nEvents).map { i =>
        val op = rnd.nextInt(4) match {
          case 0 => "D"
          case 1 => "U"
          case _ => "I"
        }
        (op, rnd.nextInt(nKeys).toLong, s"v${rnd.nextInt(1000)}", i.toLong)
      }
      val cut = 1 + rnd.nextInt(nEvents - 1) // both halves non-empty
      def df(rows: Seq[(String, Long, String, Long)]) =
        rows.toDF(C.Op, "id", "value", "ts").repartition(4)
      val (pre, post) = events.splitAt(cut)
      val merged = ChangeLogReducer.historyMerge(
        ChangeLogReducer.history(df(pre), Seq("id"), col("ts"), col("ts")),
        ChangeLogReducer.historyCursor(df(pre), Seq("id")),
        df(post), Seq("id"), col("ts"), col("ts"))
        .select(histCols.map(col): _*)
        .sort("id", "version").collect().toSeq
      val full = ChangeLogReducer
        .history(df(events), Seq("id"), col("ts"), col("ts"))
        .select(histCols.map(col): _*)
        .sort("id", "version").collect().toSeq
      assert(merged === full, s"iteration $iter (events=$nEvents cut=$cut)")
    }
  }
}
