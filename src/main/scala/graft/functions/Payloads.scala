package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Column-level payload decoders — the Spark-first counterpart of the
  * reference's pluggable DeserializationSchema
  * (EMQXSource.java:43 takes a DeserializationSchema<OUT>; here the
  * envelope's binary payload is decoded declaratively so Catalyst
  * keeps the whole pipeline in codegen).
  */
object Payloads {

  /** UTF-8 string payload (the reference test's StringDeserializer). */
  def asString(payload: Column): Column = payload.cast("string")

  /** JSON payload → struct of `schema`. */
  def asJson(payload: Column, schema: DataType): Column =
    from_json(payload.cast("string"), schema)

  /** Single-field extraction from a JSON payload via RE2/Java-regex
    * compatible pattern — used where the oracle must mirror the
    * decode without a JSON engine.
    */
  def jsonField(payload: Column, field: String): Column =
    regexp_extract(payload.cast("string"),
      "\"" + java.util.regex.Pattern.quote(field) + "\":\\s*\"?([^\",}]*)\"?",
      1)

  /** CSV payload → array of fields. */
  def asCsv(payload: Column): Column = split(payload.cast("string"), ",")
}
