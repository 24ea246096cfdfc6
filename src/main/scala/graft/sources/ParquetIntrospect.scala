package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType, Type}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Parquet footer introspection — DuckDB's `parquet_metadata` /
  * `parquet_schema` / `parquet_file_metadata` table functions
  * (reference capability: the DuckDB host the reference extension loads
  * into; column names and row shapes match DuckDB 1.0's output so the
  * same diagnostics SQL runs on both engines).
  *
  * Scale design: the file LISTING happens driver-side (bounded — it is
  * a glob over a filesystem, the same work a scan's file index does),
  * but FOOTER READS are distributed — each task opens only its own
  * files' footers, so a 100 TB lake of a million part files fans out
  * across the cluster instead of serializing a million driver round
  * trips. Output volume is bounded by row-groups x columns (metadata),
  * schema nodes (schema), or files (file_metadata) — never data rows.
  * The Hadoop conf is shipped as a String map (the class itself is not
  * serializable), so schemed URIs (s3a://, hdfs://) keep their
  * credentials/settings on executors.
  *
  * Column notes vs DuckDB: `file_offset` is omitted (DuckDB surfaces
  * the raw thrift `file_offset` field, which writers populate
  * inconsistently — parquet-mr's `getStartingPos` disagrees with
  * parquet-cpp's value on the same file); `format_version` is null
  * (parquet-mr's footer API does not expose the thrift version int);
  * float/double `stats_*_value` render via JVM `toString`, whose
  * scientific-notation cutoffs differ from DuckDB's — compare stats on
  * int/string columns cross-engine, not floats.
  */
object ParquetIntrospect {

  val metadataSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("row_group_id", LongType),
    StructField("row_group_num_rows", LongType),
    StructField("row_group_num_columns", LongType),
    StructField("row_group_bytes", LongType),
    StructField("column_id", LongType),
    StructField("num_values", LongType),
    StructField("path_in_schema", StringType),
    StructField("type", StringType),
    StructField("stats_min_value", StringType),
    StructField("stats_max_value", StringType),
    StructField("stats_null_count", LongType),
    StructField("compression", StringType),
    StructField("encodings", StringType),
    StructField("dictionary_page_offset", LongType),
    StructField("data_page_offset", LongType),
    StructField("total_compressed_size", LongType),
    StructField("total_uncompressed_size", LongType)))

  val schemaSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("type_length", LongType),
    StructField("repetition_type", StringType),
    StructField("num_children", LongType),
    StructField("converted_type", StringType),
    StructField("scale", LongType),
    StructField("precision", LongType),
    StructField("field_id", LongType),
    StructField("logical_type", StringType)))

  val fileMetadataSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("created_by", StringType),
    StructField("num_rows", LongType),
    StructField("num_row_groups", LongType),
    StructField("format_version", LongType)))

  /** Glob-expand `pattern`; a directory lists its part files (so both
    * `dir/file.parquet` and a datasource directory work). Sorted for a
    * deterministic row order.
    */
  private def listFiles(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val schemed = pattern.contains("://")
    def render(pp: Path): String =
      if (schemed) pp.toString else pp.toUri.getPath
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matches.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(s => render(s.getPath))
      else Seq(render(st.getPath))
    }.sorted
  }

  /** Distributed footer fan-out: one task per slice of the file list;
    * `rows` turns one footer into its output rows.
    */
  private def footerDf(spark: SparkSession, pattern: String,
      schema: StructType)(
      rows: (String, ParquetMetadata) => Seq[Row]): DataFrame = {
    val files = listFiles(spark, pattern)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val hconf = spark.sessionState.newHadoopConf()
    val confMap: Map[String, String] = {
      val it = hconf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val parallelism = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(files, parallelism)
      .mapPartitions { it =>
        val conf = new Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        it.flatMap { f =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f), conf))
          try rows(f, reader.getFooter)
          finally reader.close()
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** `parquet_metadata('glob')` — one row per (row group, column chunk). */
  def metadata(spark: SparkSession, pattern: String): DataFrame =
    footerDf(spark, pattern, metadataSchema) { (file, footer) =>
      footer.getBlocks.asScalaSeq.zipWithIndex.flatMap { case (block, gid) =>
        val cols = block.getColumns.asScalaSeq
        cols.zipWithIndex.map { case (c, cid) =>
          val pt = c.getPrimitiveType
          val stats = c.getStatistics
          val hasStats = stats != null && !stats.isEmpty
          def statStr(v: AnyRef): String =
            if (v == null) null
            else pt.getPrimitiveTypeName match {
              case PrimitiveType.PrimitiveTypeName.BINARY |
                   PrimitiveType.PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
                val la = pt.getLogicalTypeAnnotation
                if (la != null && la.toString == "STRING")
                  new String(
                    v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
                    java.nio.charset.StandardCharsets.UTF_8)
                else null
              case PrimitiveType.PrimitiveTypeName.INT96 => null
              case PrimitiveType.PrimitiveTypeName.INT32 |
                   PrimitiveType.PrimitiveTypeName.INT64 =>
                import org.apache.parquet.schema.LogicalTypeAnnotation._
                pt.getLogicalTypeAnnotation match {
                  case t: TimestampLogicalTypeAnnotation =>
                    val raw = v.asInstanceOf[java.lang.Number].longValue
                    val micros = t.getUnit match {
                      case TimeUnit.MILLIS => math.multiplyExact(raw, 1000L)
                      case TimeUnit.MICROS => raw
                      case TimeUnit.NANOS => Math.floorDiv(raw, 1000L)
                    }
                    renderTimestampMicros(micros)
                  case _: DateLogicalTypeAnnotation =>
                    java.time.LocalDate.ofEpochDay(
                      v.asInstanceOf[java.lang.Number].longValue).toString
                  case _ => String.valueOf(v)
                }
              case _ => String.valueOf(v)
            }
          val dictOff = c.getDictionaryPageOffset
          Row(
            file,
            gid.toLong,
            block.getRowCount,
            cols.size.toLong,
            block.getTotalByteSize,
            cid.toLong,
            c.getValueCount,
            c.getPath.toDotString,
            physicalName(pt.getPrimitiveTypeName),
            if (hasStats) statStr(stats.genericGetMin.asInstanceOf[AnyRef]) else null,
            if (hasStats) statStr(stats.genericGetMax.asInstanceOf[AnyRef]) else null,
            if (hasStats && !stats.isNumNullsSet) null
            else if (hasStats) stats.getNumNulls
            else null,
            c.getCodec.name,
            c.getEncodings.asScalaSeq.map(_.name).sorted.mkString(", "),
            if (dictOff > 0) java.lang.Long.valueOf(dictOff) else null,
            c.getFirstDataPageOffset,
            c.getTotalSize,
            c.getTotalUncompressedSize)
        }
      }
    }

  /** `parquet_schema('glob')` — depth-first schema tree, root first
    * (DuckDB's row order).
    */
  def schemaOf(spark: SparkSession, pattern: String): DataFrame =
    footerDf(spark, pattern, schemaSchema) { (file, footer) =>
      val root: MessageType = footer.getFileMetaData.getSchema
      def walk(t: Type, isRoot: Boolean): Seq[Row] = t match {
        case g: GroupType =>
          val self = Row(
            file, g.getName, null, null,
            if (isRoot) "REQUIRED" else g.getRepetition.name,
            g.getFieldCount.toLong,
            Option(g.getOriginalType).map(_.name).orNull,
            null, null,
            Option(g.getId).map(i => java.lang.Long.valueOf(i.intValue.toLong)).orNull,
            Option(g.getLogicalTypeAnnotation).map(_.toString).orNull)
          self +: g.getFields.asScalaSeq.flatMap(walk(_, isRoot = false))
        case p: PrimitiveType =>
          val dec = Option(p.getDecimalMetadata)
          Seq(Row(
            file, p.getName, physicalName(p.getPrimitiveTypeName),
            if (p.getTypeLength > 0) java.lang.Long.valueOf(p.getTypeLength.toLong) else null,
            p.getRepetition.name,
            null,
            Option(p.getOriginalType).map(_.name).orNull,
            dec.map(d => java.lang.Long.valueOf(d.getScale.toLong)).orNull,
            dec.map(d => java.lang.Long.valueOf(d.getPrecision.toLong)).orNull,
            Option(p.getId).map(i => java.lang.Long.valueOf(i.intValue.toLong)).orNull,
            Option(p.getLogicalTypeAnnotation).map(_.toString).orNull))
      }
      walk(root, isRoot = true)
    }

  /** `parquet_file_metadata('glob')` — one row per file. */
  def fileMetadata(spark: SparkSession, pattern: String): DataFrame =
    footerDf(spark, pattern, fileMetadataSchema) { (file, footer) =>
      val blocks = footer.getBlocks.asScalaSeq
      Seq(Row(
        file,
        footer.getFileMetaData.getCreatedBy,
        blocks.map(_.getRowCount).sum,
        blocks.size.toLong,
        null))
    }

  /** DuckDB spells parquet's BINARY physical type `BYTE_ARRAY` (the
    * thrift name); parquet-mr's enum says `BINARY` — map to DuckDB's.
    */
  private def physicalName(t: PrimitiveType.PrimitiveTypeName): String =
    if (t == PrimitiveType.PrimitiveTypeName.BINARY) "BYTE_ARRAY" else t.name

  /** DuckDB's timestamp VARCHAR rendering (pinned on 1.0): UTC wall
    * time, fraction trimmed of trailing zeros, dot dropped when the
    * fraction is zero — `00:00:00.1`, `00:00:00`, `00:00:00.000123`.
    */
  private def renderTimestampMicros(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val dt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").format(dt)
    if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** 2.13-source-compatible java.util.List view without importing the
    * full CollectionConverters at each use site.
    */
  private implicit class JListOps[T](val l: java.util.List[T]) {
    def asScalaSeq: Seq[T] = {
      import scala.jdk.CollectionConverters._
      l.asScala.toSeq
    }
  }
  private implicit class JSetOps[T](val s: java.util.Set[T]) {
    def asScalaSeq: Seq[T] = {
      import scala.jdk.CollectionConverters._
      s.asScala.toSeq
    }
  }
}
