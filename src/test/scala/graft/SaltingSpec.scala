package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val left = spark.range(1000)
      .select(when($"id" < 900, 7L).otherwise($"id").as("k"), $"id".as("v"))
    val right = Seq((7L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = left.join(right, "k").select($"v", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Salting.saltedJoin(left, right, "k", 8, "v")
      .select($"v", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(plain.size === 901)
  }

  test("salted two-phase count equals plain count") {
    val df = spark.range(10000)
      .select(when($"id" % 10 < 9, 1L).otherwise($"id").as("k"), $"id".as("v"))
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(df, "k", 16, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salt is deterministic across evaluations") {
    val df = spark.range(100).select($"id", Salting.salt($"id", 8).as("s"))
    val a = df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
    assert(df.select("s").distinct().count() > 1)
  }
}
