package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Secret-driven source registry — the reference's collection model.
  *
  * The reference enumerates databases from Secrets Manager, parses each
  * secret's JSON (`engine`, `host`, `port`, `username`, `password`,
  * `dbname`) and builds a per-engine DSN
  * (collector/exporters/mysql/mysql-exporter.go:85,
  * postgres/postgres-exporter.go:22, oracle/oracle-exporter.go:15).
  * Spark-native equivalent: the same config JSON resolves to a
  * DataFrameReader — `jdbc` for live databases, file formats for lake
  * tables — so "collect from every registered source" becomes a union
  * of DataFrames that Catalyst plans per-source (JDBC predicate
  * pushdown included).
  */
object SourceRegistry {

  val secretSchema: StructType = StructType(Seq(
    StructField("engine", StringType),
    StructField("host", StringType),
    StructField("port", StringType),
    StructField("username", StringType),
    StructField("password", StringType),
    StructField("dbname", StringType),
    StructField("format", StringType),
    StructField("path", StringType)))

  /** Parse raw secret JSON payloads into typed config rows. */
  def parseSecrets(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    payloads.toDF("secret_json")
      .select(from_json(col("secret_json"), secretSchema).as("c"))
      .select("c.*")
  }

  /** DSN construction, byte-for-byte the reference exporters' formats. */
  def withDsn(configs: DataFrame): DataFrame =
    configs.withColumn("dsn",
      when(col("engine") === "mysql",
        concat(col("username"), lit(":"), col("password"), lit("@tcp("),
          col("host"), lit(":"), col("port"), lit(")/")))
        .when(col("engine") === "postgres",
          concat(lit("postgresql://"), col("username"), lit(":"), col("password"),
            lit("@"), col("host"), lit(":"), col("port"), lit("/"), col("dbname"),
            lit("?sslmode=disable")))
        .when(col("engine").isin("oracle", "oracle-ee", "custom-oracle-ee"),
          concat(col("host"), lit(":"), col("port"), lit("/"), col("dbname")))
        .otherwise(lit(null)))

  /** Resolve one parsed config row to a DataFrame. File formats read
    * `path`; engine configs go through Spark's JDBC source with the
    * engine-appropriate URL. */
  def read(spark: SparkSession, config: Map[String, String]): DataFrame = {
    config.getOrElse("format", "jdbc") match {
      case "parquet" => spark.read.parquet(config("path"))
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
        .csv(config("path"))
      case "json" => spark.read.json(config("path"))
      case "jdbc" =>
        val url = config("engine") match {
          case "mysql" => s"jdbc:mysql://${config("host")}:${config("port")}/${config.getOrElse("dbname", "")}"
          case "postgres" => s"jdbc:postgresql://${config("host")}:${config("port")}/${config.getOrElse("dbname", "")}"
          case "derby" => s"jdbc:derby:${config("path")}"
          case e if e.startsWith("oracle") => s"jdbc:oracle:thin:@//${config("host")}:${config("port")}/${config("dbname")}"
          case other => sys.error(s"unsupported engine: $other")
        }
        val reader = spark.read.format("jdbc")
          .option("url", url)
          .option("dbtable", config.getOrElse("dbtable", sys.error("dbtable required")))
        val withUser = config.get("username").fold(reader)(u => reader.option("user", u))
        config.get("password").fold(withUser)(p => withUser.option("password", p))
          .load()
    }
  }

  /** Demo secret payloads shaped like the reference's Secrets Manager
    * entries — deterministic, used by the `source_config_dsn` entry. */
  val demoSecrets: Seq[String] = Seq(
    """{"engine":"mysql","host":"db1.example.com","port":"3306","username":"scott","password":"tiger","dbname":"prod"}""",
    """{"engine":"postgres","host":"db2.example.com","port":"5432","username":"pguser","password":"pgpass","dbname":"appdb"}""",
    """{"engine":"oracle-ee","host":"db3.example.com","port":"1521","username":"system","password":"orapwd","dbname":"ORCL"}""",
    """{"engine":"sqlite","host":"db4.example.com","port":"0","username":"u","password":"p","dbname":"x"}""")

  /** Mask the password segment of a DSN for anything user-facing. The
    * full DSN exists only on the internal reader path; dumped artifacts
    * (Verify parquet, logs) must never carry plaintext credentials. */
  def redactDsn(dsn: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(dsn, ":[^:@/]*@", ":***@")

  /** Rows-only entry: secrets → parsed configs → DSNs (unsupported
    * engines get null DSN, mirroring the reference's "Unsupported
    * database engine" warn-and-skip). Passwords are redacted — this
    * result lands in correctness artifacts. */
  def configDsn(spark: SparkSession, dir: String): DataFrame =
    withDsn(parseSecrets(spark, demoSecrets))
      .withColumn("dsn", redactDsn(col("dsn")))
      .select("engine", "host", "port", "dbname", "dsn")
      .orderBy("engine")

  /** Rows-only entry: registry-driven file read (parquet branch). */
  def registryRead(spark: SparkSession, dir: String): DataFrame =
    read(spark, Map("format" -> "parquet", "path" -> s"$dir/nation.parquet"))
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("source_config_dsn", configDsn _, None),
    ("source_registry", registryRead _, None))
}
