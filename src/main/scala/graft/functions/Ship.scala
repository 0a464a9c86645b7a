package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, udf}

/** Ship driver-computed kernel results back as a distributed DataFrame:
  * broadcast primitive column arrays + a range+lookup projection. A
  * Seq.toDF LocalRelation instead re-serializes every boxed row into
  * each consuming job (~0.9 s at 270k rows); broadcast arrays ship once
  * and the rows materialize in executors. Shared by every hybrid-kernel
  * output path (dedup, ANN, events, graph views). */
object Ship {

  def df(spark: SparkSession, cols: (String, Array[_])*): DataFrame = {
    val n = if (cols.isEmpty) 0 else cols.head._2.length
    // fail at the ship site, not with an opaque AIOOBE inside whichever
    // query first scans a ragged row
    require(cols.forall(_._2.length == n),
      s"Ship.df: ragged columns ${cols.map(c => c._1 -> c._2.length)}")
    val fields = cols.map { case (name, arr) =>
      arr match {
        case a: Array[Long] =>
          val bc = spark.sparkContext.broadcast(a)
          val f = udf((i: Long) => bc.value(i.toInt))
          f(col("id")).as(name)
        case a: Array[Double] =>
          val bc = spark.sparkContext.broadcast(a)
          val f = udf((i: Long) => bc.value(i.toInt))
          f(col("id")).as(name)
        case a: Array[String] =>
          val bc = spark.sparkContext.broadcast(a)
          val f = udf((i: Long) => bc.value(i.toInt))
          f(col("id")).as(name)
        // boxed variants carry nullable kernel outputs (e.g. the as-of
        // join's no-prior-match columns); ScalaReflection maps them to
        // nullable LongType/DoubleType
        case a: Array[java.lang.Long] =>
          val bc = spark.sparkContext.broadcast(a)
          val f = udf((i: Long) => bc.value(i.toInt))
          f(col("id")).as(name)
        case a: Array[java.lang.Double] =>
          val bc = spark.sparkContext.broadcast(a)
          val f = udf((i: Long) => bc.value(i.toInt))
          f(col("id")).as(name)
        case other =>
          throw new IllegalArgumentException(s"unsupported ${other.getClass}")
      }
    }
    spark.range(n.toLong).select(fields: _*)
  }
}
