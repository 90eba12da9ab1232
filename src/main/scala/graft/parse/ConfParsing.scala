package graft.parse

import graft.model.JobConfRec
import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Try

/** Job-configuration XML parsing (reference
  * `parsing/ParseJobConfs.java:159-229`, P6/S2):
  * `<configuration><property><name>…<value>…` documents → one
  * `map<string,string>` record per job, jobId regexed from the file
  * name (abort row if absent, `ParseJobConfs.java:187-194`).
  *
  * Source shape: `spark.read.format("binaryFile")` — whole-document
  * records with path provenance, the Spark-native replacement for the
  * reference's non-splittable `CombineDocumentFileFormat`. Small-file
  * packing is native (`spark.sql.files.maxPartitionBytes`).
  */
object ConfParsing {

  private val JobIdRx = """job_\d+_\d+""".r

  /** Pure parse of one conf document. Secure DOM settings: external
    * entities disabled (untrusted input). */
  def parseConfXml(path: String, cluster: String, bytes: Array[Byte]): Option[JobConfRec] =
    JobIdRx.findFirstIn(path.split('/').last).flatMap { jobId =>
      Try {
        val dbf = DocumentBuilderFactory.newInstance()
        dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        dbf.setExpandEntityReferences(false)
        val doc = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
        val props = doc.getElementsByTagName("property")
        val kvs = (0 until props.getLength).flatMap { i =>
          val children = props.item(i).getChildNodes
          var name: Option[String] = None
          var value: Option[String] = None
          (0 until children.getLength).foreach { j =>
            val c = children.item(j)
            c.getNodeName match {
              case "name"  => name = Some(c.getTextContent)
              case "value" => value = Some(c.getTextContent)
              case _       => ()
            }
          }
          for (n <- name; v <- value) yield n -> v
        }
        JobConfRec(jobId, cluster, path, kvs.toMap)
      }.toOption
    }

  /** Distributed conf ETL: directory of XML files → Dataset[JobConfRec].
    * Map-only (no shuffle) like the reference's `setNumReduceTasks(0)`. */
  def parseConfDir(dir: String, cluster: String)(
      implicit spark: SparkSession): Dataset[JobConfRec] =
    parseConfDirs(Seq(dir), cluster)

  /** Multi-directory form — ONE load()/listing for a whole day window.
    * A window is O(100) day dirs and each separate load() pays a
    * driver analysis + listing + `_spark_metadata` probe; per-day
    * loads made the conf stage O(days) driver fixed cost
    * (STRESS.md round-10 ETL rehearsal). */
  def parseConfDirs(dirs: Seq[String], cluster: String)(
      implicit spark: SparkSession): Dataset[JobConfRec] =
    parseConfDirsAuto(dirs, _ => cluster)

  /** Fleet form: ONE load over every cluster's day dirs, the cluster
    * derived from each file's path (reference layout
    * `<logsRoot>/<cluster>/daily/…` — [[clusterFromPath]]). One Spark
    * job for the whole fleet instead of one per cluster. */
  def parseConfDirsAuto(dirs: Seq[String],
      clusterOf: String => String = clusterFromPath)(
      implicit spark: SparkSession): Dataset[JobConfRec] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xml")
      .load(dirs: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseConfXml(path, clusterOf(path), bytes) }
  }

  /** Cluster from a reference-layout path: the component before
    * `/daily/` (`<logsRoot>/<cluster>/daily/<queue>/<yyyy>/<MMdd>/…`).
    * Works on both plain paths and `file:`/`hdfs:` URIs. */
  def clusterFromPath(path: String): String =
    ClusterRx.findFirstMatchIn(path).map(_.group(1)).getOrElse("unknown")

  private val ClusterRx = "([^/]+)/daily/".r
}
