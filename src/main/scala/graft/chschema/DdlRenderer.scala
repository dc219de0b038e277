package graft.chschema

import org.apache.spark.sql.types._

/**
 * ClickHouse `CREATE TABLE` DDL renderer over a Spark `StructType`.
 *
 * Reproduces, byte-for-byte, the output format of the reference's
 * visitor-based emitter (reference: src/parquetutils.rs:17-61 frame,
 * :144-291 per-node cases) for the same Parquet files. The reference
 * walks the raw Parquet type tree; Spark's reader has already normalized
 * 2-level/3-level/legacy lists and `key_value` map groups into
 * `ArrayType`/`MapType` (so the compat logic at
 * src/parquetvisitor.rs:35-79 is unnecessary here), which means we render
 * from the logical schema and re-introduce the reference's surface quirks:
 *
 *  - 4-space indent, leading-comma separators (src/parquetutils.rs:44-50)
 *  - every non-pk scalar is `Nullable(T)` regardless of Parquet
 *    repetition (src/parquetutils.rs:169-172; SURVEY.md §1.4.1)
 *  - the primary-key column is emitted bare/non-nullable
 *    (src/parquetutils.rs:159-162) and is NOT validated against the
 *    schema (src/parquetutils.rs:331-336)
 *  - `ArrayType(StructType)` → `name Nested (` with flattened element
 *    fields (src/parquetutils.rs:263-291)
 *  - `ArrayType(scalar)` → `element Nullable(T)` line
 *    (src/parquetutils.rs:163-168)
 *  - `MapType` → `name Map (` with a bare unnamed key type and a bare or
 *    anonymous-`Tuple(` value (src/parquetutils.rs:144-157,186-196,223-261)
 */
object DdlRenderer {
  import ClickHouseType.{Mode, Legacy}

  private val Ind = 4

  /** Full script: `drop table` + `create table`, matching the frame at
   * reference src/parquetutils.rs:33-56.
   *
   * `lowCardinality` names top-level String columns to wrap as
   * `LowCardinality(String)` (ClickHouse dictionary encoding — the
   * extended-mode M5 item from SURVEY.md §7). Ignored in Legacy mode and
   * for non-String/nested columns; candidates can be mined from data
   * with [[SchemaUtils.suggestLowCardinality]].
   *
   * `partitionBy` (a raw ClickHouse expression, e.g. `toYYYYMM(d)`) and
   * `orderBy` (sorting-key columns) extend the MergeTree clause — the
   * first hand-edit a real ClickHouse user makes to the reference's
   * output (it emits only `primary key (…)`, src/parquetutils.rs:54-56).
   * Extended-mode-only, like LowCardinality; like the reference's pk,
   * they are NOT validated against the schema (SURVEY.md §1.4.3), and
   * ClickHouse itself enforces that the primary key prefixes the sorting
   * key. */
  def render(schema: StructType, table: String, primaryKey: String,
             mode: Mode = Legacy,
             lowCardinality: Set[String] = Set.empty,
             partitionBy: Option[String] = None,
             orderBy: Seq[String] = Nil): String = {
    val sb = new StringBuilder
    sb ++= s"drop table if exists $table;\n"
    sb ++= s"create table $table (\n"
    val lc = if (mode == Legacy) Set.empty[String] else lowCardinality
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      sb ++= " " * Ind
      if (i > 0) sb ++= ", "
      // ClickHouse nests Nullable INSIDE LowCardinality
      if (lc(f.name) && f.dataType == StringType)
        sb ++= (if (f.name == primaryKey) s"${f.name} LowCardinality(String)\n"
                else s"${f.name} LowCardinality(Nullable(String))\n")
      else
        renderField(sb, f.name, f.dataType, indent = Ind, primaryKey, mode)
    }
    val extras = new StringBuilder
    if (mode != Legacy) {
      partitionBy.foreach(p => extras ++= s" partition by ($p)")
      if (orderBy.nonEmpty) extras ++= s" order by (${orderBy.mkString(", ")})"
    }
    sb ++= s") engine = MergeTree()$extras primary key ($primaryKey);\n"
    sb.toString
  }

  /** One field line/block. The caller has already written this line's
   * leading indentation + `, ` separator, mirroring how the reference's
   * parents indent their children before `dispatch`
   * (src/parquetutils.rs:44-50,204-212). `indent` is the current nesting
   * depth used for child lines and closing parens. */
  private def renderField(sb: StringBuilder, name: String, dt: DataType,
                          indent: Int, pk: String, mode: Mode): Unit = dt match {
    case st: StructType =>
      // visit_struct, non-wrapper branch (src/parquetutils.rs:186-218)
      sb ++= s"$name Tuple(\n"
      renderStructBody(sb, st, indent + Ind, pk, mode)
      sb ++= " " * indent
      sb ++= ")\n"

    case ArrayType(et, _) if mode == ClickHouseType.Extended &&
        !et.isInstanceOf[StructType] && !et.isInstanceOf[ArrayType] &&
        !et.isInstanceOf[MapType] =>
      // extended mode renders primitive lists as the native ClickHouse
      // Array(T) (SURVEY.md §2.A R10) instead of the reference's
      // Nested-with-element form
      sb ++= s"$name Array(Nullable(${ClickHouseType.fromSpark(et, mode).name}))\n"

    case ArrayType(et, _) =>
      // visit_list_with_item (src/parquetutils.rs:263-291): `Nested (`
      // header; the 3-level `list`/`element` wrappers are transparent.
      sb ++= s"$name Nested (\n"
      et match {
        case st: StructType =>
          renderStructBody(sb, st, indent + Ind, pk, mode)
        case inner: ArrayType =>
          sb ++= " " * (indent + Ind)
          renderField(sb, "element", inner, indent + Ind, pk, mode)
        case m: MapType =>
          sb ++= " " * (indent + Ind)
          renderField(sb, "element", m, indent + Ind, pk, mode)
        case scalar =>
          // primitive list element keeps its Parquet wrapper name
          // (visit_primitive `array`/`element` case,
          // src/parquetutils.rs:163-168)
          sb ++= " " * (indent + Ind)
          sb ++= s"element Nullable(${ClickHouseType.fromSpark(scalar, mode).name})\n"
      }
      sb ++= " " * indent
      sb ++= ")\n"

    case MapType(kt, vt, _) =>
      // visit_map outer header (src/parquetutils.rs:227-233) + key_value
      // body (:235-261). Key: bare type, no name, no Nullable
      // (src/parquetutils.rs:155-157).
      sb ++= s"$name Map (\n"
      val body = indent + Ind
      sb ++= " " * body
      sb ++= s"${ClickHouseType.fromSpark(kt, mode).name}\n"
      sb ++= " " * body
      sb ++= ", "
      vt match {
        case st: StructType =>
          // map value struct → anonymous Tuple( (src/parquetutils.rs:189-193)
          sb ++= "Tuple(\n"
          renderStructBody(sb, st, body + Ind, pk, mode)
          sb ++= " " * body
          sb ++= ")\n"
        case nested @ (_: ArrayType | _: MapType) =>
          // a list/map map-value re-enters the visitor with the Parquet
          // field name `value` (dispatch from visit_map's loop,
          // src/parquetutils.rs:242-252 → visit_list_with_item/visit_map)
          renderField(sb, "value", nested, body, pk, mode)
        case other =>
          // primitive map value is emitted bare, like the key
          // (visit_primitive field_name=="Map" branch,
          // src/parquetutils.rs:153-157)
          sb ++= s"${ClickHouseType.fromSpark(other, mode).name}\n"
      }
      sb ++= " " * indent
      sb ++= ")\n"

    case scalar =>
      val t = ClickHouseType.fromSpark(scalar, mode).name
      if (name == pk) sb ++= s"$name $t\n" // pk bare (src/parquetutils.rs:159-162)
      else sb ++= s"$name Nullable($t)\n"
  }

  /** Children of a Tuple/Nested body: first line indented, following
   * lines `indent + ", "` (src/parquetutils.rs:204-212). */
  private def renderStructBody(sb: StringBuilder, st: StructType, indent: Int,
                               pk: String, mode: Mode): Unit =
    st.fields.zipWithIndex.foreach { case (f, i) =>
      sb ++= " " * indent
      if (i > 0) sb ++= ", "
      renderField(sb, f.name, f.dataType, indent, pk, mode)
    }
}
