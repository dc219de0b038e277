package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.chschema.{ClickHouseType, DdlRenderer}

/**
 * The reference's own capability surfaced as queryable results
 * (SURVEY.md §2.C "core"): footer schema as rows, and the generated DDL
 * text. Both are engine-specific strings, so no DuckDB oracle — the
 * byte-level contract is locked by the golden tests in DdlRendererSpec.
 */
object SchemaQueries {

  private def chTypeName(dt: DataType): String = dt match {
    case st: StructType => st.fields.map(f => s"${f.name} ${chTypeName(f.dataType)}")
      .mkString("Tuple(", ", ", ")")
    case ArrayType(et, _) => s"Nested(${chTypeName(et)})"
    case MapType(k, v, _) => s"Map(${chTypeName(k)}, ${chTypeName(v)})"
    case scalar => ClickHouseType.fromSpark(scalar, ClickHouseType.Legacy).name
  }

  val defs: Vector[QueryDef] = Vector(

    QueryDef("schema_columns",
      (s, dir) => {
        import s.implicits._
        val schema = s.read.parquet(s"$dir/lineitem.parquet").schema
        schema.fields.toSeq.zipWithIndex
          .map { case (f, i) => (i, f.name, chTypeName(f.dataType), f.nullable) }
          .toDF("ordinal", "col_name", "ch_type", "nullable")
          .orderBy("ordinal")
      },
      None),

    QueryDef("ddl_lineitem",
      (s, dir) => {
        import s.implicits._
        val schema = s.read.parquet(s"$dir/lineitem.parquet").schema
        val ddl = DdlRenderer.render(schema, "lineitem", "l_orderkey")
        Seq(("lineitem", ddl)).toDF("table_name", "ddl")
      },
      None)
  )
}
