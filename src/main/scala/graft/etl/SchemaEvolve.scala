package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Add-column schema evolution for the CDC lanes — the one evolution
  * every lake format supports (Delta/Iceberg/Hudi `mergeSchema`):
  * a later changelog batch may ADD columns; rows written before the
  * column existed read as NULL there. Everything else is rejected
  * loudly:
  *
  *  - a column present on both sides with a DIFFERENT type is a retype,
  *    not an addition — that requires a table rewrite, and silently
  *    casting would corrupt latest-wins merges, so [[evolved]] throws;
  *  - a batch that STOPS carrying a column is fine (the full-row-image
  *    CDC convention: the row image is exactly what the change says, so
  *    an absent column upserts as NULL) — the column itself survives in
  *    the evolved schema and older rows keep their values until their
  *    key is next upserted.
  *
  * Scale shape: evolution is pure schema arithmetic on the driver plus
  * typed null-fill projections in the plan — no data pass of its own;
  * the underlying parquet readers already null-fill files written
  * before a column existed when handed the evolved read schema. */
object SchemaEvolve {

  /** `dt` with every nested nullability flag forced true — the
    * comparison domain in which "same type" means same type, not same
    * provenance (parquet reads report containsNull=true where an
    * in-memory Encoder says false). */
  private def allNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, allNullable(f.dataType), nullable = true, f.metadata)))
    case a: ArrayType => ArrayType(allNullable(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(allNullable(m.keyType), allNullable(m.valueType),
        valueContainsNull = true)
    case other => other
  }

  /** The evolved schema: `base`'s fields in order, then `incoming`'s new
    * fields in their own order. Type comparison ignores nullability
    * (evolution makes everything newly-added nullable by construction).
    * Throws on a retyped column — see the object contract. */
  def evolved(base: StructType, incoming: StructType): StructType = {
    val byName = base.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { b =>
        // normalize nullability on both sides: it lives NESTED too
        // (ArrayType.containsNull, struct-field nullable), and a batch
        // built from case classes legitimately encodes tighter
        // nullability than the parquet-read base — that is not a retype
        require(allNullable(b.dataType) == allNullable(f.dataType),
          s"schema evolution: column '${f.name}' retyped from " +
            s"${b.dataType.sql} to ${f.dataType.sql} — only add-column " +
            "evolution is supported; a retype requires a table rewrite")
      }
    }
    StructType(base.fields ++
      incoming.fields.filterNot(f => byName.contains(f.name)))
  }

  /** `df` widened to exactly `target`'s columns and order: columns the
    * frame lacks are typed NULL literals; columns outside `target` are
    * an error (the caller computed `target` as a union, so an extra
    * column means a bug, not evolution). */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fields.map(_.name).toSet
    val extra = have -- target.fields.map(_.name).toSet
    require(extra.isEmpty,
      s"schema evolution: frame carries columns ${extra.mkString(", ")} " +
        "absent from the evolved target schema")
    df.select(target.fields.map(f =>
      if (have(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
  }
}
