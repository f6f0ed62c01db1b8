package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** PLAN-NATIVE manifest file skipping (r6 verdict #4): a `FileIndex`
  * whose `listFiles` applies a manifest-derived keep set, so the prune
  * happens INSIDE the scan node — `FileSourceScanExec` plans, reports
  * (`numFiles` metric) and executes only the surviving files — instead
  * of a driver-side helper handing a file list to
  * `spark.read.parquet(files:_*)`. This is the Delta/Iceberg shape:
  * the table's file index IS where data skipping lives, composing with
  * partition and data filters Spark pushes into `listFiles` (they are
  * still applied by `super` / the scan as usual — the manifest prune
  * only ever REMOVES candidate files, never adds, so composition is an
  * intersection and lossless skipping is preserved).
  *
  * The keep set is matched by file NAME (unique within a layout
  * directory — writer-assigned UUID part files), sidestepping
  * URI-rendering differences between `input_file_name()` (the manifest
  * builder) and `FileStatus.getPath`.
  *
  * `inputFiles` and `sizeInBytes` are overridden to the kept subset so
  * everything downstream that reasons from the index — the optimizer's
  * size estimates (broadcast decisions), `df.inputFiles` probes like
  * [[graft.Tables.fanOut]] — sees the PRUNED table, not the full
  * directory. At 100 TB the index holds O(files) entries exactly like
  * the catalog listing a lakehouse planner already loads; the manifest
  * evaluation that produces `keep` stays metadata-scale.
  */
class ManifestFileIndex(spark: SparkSession, rootDir: Path,
    keepNames: Set[String])
  extends InMemoryFileIndex(spark, Seq(rootDir), Map.empty, None) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    super.listFiles(partitionFilters, dataFilters).map { pd =>
      PartitionDirectory(pd.values,
        pd.files.filter(f => keepNames.contains(f.getPath.getName)))
    }

  override def inputFiles: Array[String] =
    super.inputFiles.filter(f => keepNames.contains(new Path(f).getName))

  override def sizeInBytes: Long =
    allFiles().filter(f => keepNames.contains(f.getPath.getName))
      .map(_.getLen).sum
}

object ManifestFileIndex {
  /** A DataFrame scanning `dir` through a manifest keep set: the
    * relation's file index prunes in `listFiles`, so the plan's scan
    * node carries the skip. `keepFiles` entries may be any URI
    * rendering of the layout's files (matched by name). */
  def scan(spark: SparkSession, dir: String,
      keepFiles: Seq[String]): DataFrame = {
    val keep = keepFiles.map(f => new Path(f).getName).toSet
    val idx = new ManifestFileIndex(spark, new Path(dir), keep)
    val schema = spark.read.parquet(dir).schema
    val relation = HadoopFsRelation(
      location = idx,
      partitionSchema = idx.partitionSchema,
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
