package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EscDebugSpec extends AnyFunSuite {
  test("variant unicode-escape probe") {
    val spark = SparkSuite.session
    import spark.implicits._
    val payload = """{"v":"\u00e9\u20ac\u00b5x"}"""
    println("PAYLOAD: " + payload)
    val df = spark.createDataset(Seq(payload)).toDF("p")
    val a = df.select(expr("try_variant_get(parse_json(p), '$.v', 'string')")).head().getString(0)
    println("PROBE parse_json escaped: " + a.map(_.toInt).mkString(","))
    val b = df.select(expr("cast(parse_json('{\"v\":\"\\u00e9x\"}') as string)")).head().getString(0)
    println("PROBE literal: " + b.map(_.toInt).mkString(","))
  }
}
