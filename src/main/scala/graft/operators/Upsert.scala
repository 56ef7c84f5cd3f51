package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changeset application (CDC merge): apply insert/update/delete rows to a
  * keyed snapshot — the table-maintenance primitive behind incremental
  * corpus refreshes (new crawl drops, takedown deletes, metadata fixes).
  *
  * Semantics (last-snapshot + one changeset):
  *   - `D` rows delete the key from the snapshot;
  *   - `I`/`U` rows win over the snapshot row for their key (full-row
  *     replacement, like MERGE ... WHEN MATCHED UPDATE SET * / WHEN NOT
  *     MATCHED INSERT *);
  *   - snapshot rows without a change pass through.
  *
  * One full-outer join keyed on `keyCol` — a single shuffle per side, or
  * ZERO shuffles when both sides are bucketed by the key (StorageSpec
  * shows the bucketed-join layout); at 100 TB this is the standard
  * copy-on-write merge a table format (Delta/Iceberg/Hudi) runs under the
  * hood, expressed directly on parquet-backed frames. The changeset is
  * assumed key-unique (one winning change per key — dedup upstream with
  * e.g. max_by(ts) per key if replaying a log).
  */
object Upsert {

  /** `snapshot` columns must equal `changes` columns minus `opCol`; the
    * result keeps the snapshot schema. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCol: String, opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.filter(_ != keyCol)
    require(changes.columns.toSet == (snapshot.columns.toSet + opCol),
      s"changeset schema ${changes.columns.toSeq} must be snapshot schema plus '$opCol'")
    val s = snapshot.select(col(keyCol) +: dataCols.map(c => col(c).as(s"_s_$c")): _*)
    val c = changes.select(col(keyCol) +: col(opCol) +: dataCols.map(c => col(c).as(s"_c_$c")): _*)
    s.join(c, Seq(keyCol), "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= "D")
      .select(col(keyCol) +: dataCols.map { cn =>
        when(col(opCol).isNotNull, col(s"_c_$cn")).otherwise(col(s"_s_$cn")).as(cn)
      }: _*)
  }
}
