package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY rows=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
