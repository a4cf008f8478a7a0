package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin bridge into Spark's `private[sql]` Column <-> Expression APIs.
  * Lives under `org.apache.spark.sql` so the compiler grants package
  * access; everything else in the library stays in `graft.*` and goes
  * through this object only.
  */
/** (double, bigint) input contract with analyzer-inserted widening casts.
  * Lives here because `AbstractDataType` is `private[sql]` — graft code
  * can extend the trait but cannot name the type in a signature. */
trait DoubleLongInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.LongType)
}

/** Single-bigint input contract with analyzer-inserted widening casts
  * (same motivation as [[DoubleLongInputTypes]]). */
trait LongInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
}

object Shims {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function builder on a live session (so
    * `expr("graft_l2(a,b)")` / spark.sql work without extensions). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply an extensions object's injected functions to a LIVE session —
    * `withExtensions` only takes effect for newly built sessions, so this
    * is the path for attaching to an existing one (and for testing the
    * extension registrations without tearing down the shared context). */
  def applyFunctionExtensions(spark: SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit): Unit = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    f(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
