package graft.engine

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** dbt SEEDS: CSV files under the project's `data/` directory that
  * materialize as warehouse TABLES and participate in `ref()` exactly
  * like models (`/root/reference/data/` is the reference's — empty —
  * seed dir; `dbt seed` loads every CSV there). A seed [[Model]] has no
  * refs, builds by reading the CSV (header + schema inference, dbt's
  * own loading behavior), and fingerprints the FILE BYTES — so editing
  * a seed reselects it and its descendants under `state:modified` slim
  * CI, dbt's `state:modified` seed semantics.
  *
  * Seeds are small by design (dbt warns at ~1 MB): reading one through
  * the driver-side CSV reader and materializing it as a table is the
  * intended shape; large reference data belongs in sources.
  */
object Seeds {

  /** One seed from a CSV file; model name defaults to the file
    * basename, exactly like dbt.
    */
  def fromCsv(path: String, name: Option[String] = None,
              schema: Option[String] = None,
              database: Option[String] = None,
              /** dbt seeds `column_types:` — explicit per-column types
                * overriding inference (the dbt escape hatch for zip
                * codes losing leading zeros, ids read as doubles...).
                * Types are Spark DDL strings (`string`, `decimal(10,2)`).
                */
              columnTypes: Map[String, String] = Map.empty): Model = {
    val p = Paths.get(path)
    require(Files.exists(p), s"seed CSV not found: $path")
    val nm = name.getOrElse(p.getFileName.toString.stripSuffix(".csv"))
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
    Model(nm, Nil,
      (s, _) => {
        val inferred = s.read.option("header", "true")
          .option("inferSchema", "true").csv(path)
        val unknown = columnTypes.keySet -- inferred.columns.toSet
        require(unknown.isEmpty,
          s"seed $nm: column_types names columns not in the CSV: ${unknown.mkString(", ")}")
        if (columnTypes.isEmpty) inferred
        else {
          // Re-read (not cast) the overridden columns: a cast of an
          // inferred value can already have destroyed the text (a
          // leading-zero zip inferred as int), dbt applies the declared
          // type AT LOAD for the same reason.
          val declared = org.apache.spark.sql.types.StructType(inferred.schema.map(f =>
            columnTypes.get(f.name)
              .map(t => f.copy(dataType = org.apache.spark.sql.types.DataType.fromDDL(t)))
              .getOrElse(f)))
          s.read.option("header", "true").schema(declared).csv(path)
        }
      },
      Table, schema, database, fingerprint = Some(fp))
  }

  /** Every `*.csv` under `dataDir` (dbt's `data/` / `seeds/` dir), in
    * deterministic name order.
    */
  def fromDir(dataDir: String, schema: Option[String] = None,
              database: Option[String] = None): Seq[Model] = {
    val d = Paths.get(dataDir)
    if (!Files.isDirectory(d)) return Nil
    Files.list(d).iterator().asScala
      .filter(f => f.getFileName.toString.endsWith(".csv"))
      .toSeq.sortBy(_.getFileName.toString)
      .map((f: Path) => fromCsv(f.toString, schema = schema, database = database))
  }
}
