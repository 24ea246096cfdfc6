package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Behavior, Bpe, Dedup, Multimodal, PageRank, QualityClassifier, RangeJoin, Scratch, Similarity, SuffixSpans, TextAnalysis, Triangles, ZOrder}
import graft.streaming.EventsStreaming

/** Declared queries for the training-data-pipeline operators (the
  * beyond-reference scope): deduplication (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard / embedding-cosine), similarity search (brute-force and
  * IVF), text analysis, multimodal binary columns, and a Structured
  * Streaming window aggregate.
  *
  * Oracle notes: LSH candidate generation + exact verification makes the
  * output equal to the exact threshold predicate (up to banding recall,
  * ~1 at the thresholds used), so the DuckDB oracles compute the exact
  * predicate through the same inverted-index shape. Scores that feed
  * rankings are quantized (round 3/6) with id tie-breaks so both engines
  * rank identically. SimHash pairs have no oracle (hash family is
  * engine-specific); its recall is asserted in PipelineSpec instead.
  */
object PipelineQueries {

  final case class Declared(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Engine.table(spark, sfDir, name)

  /** The STANDING archive index for dedup_incremental_near_idx — built
    * once per (session, sfDir) and probed by every subsequent increment,
    * exactly the persisted-bucketed-tables contract of a daily crawl (the
    * nightly job builds it; increments only read it). The first call pays
    * the build, so the bench's min-of-3 reports the per-increment cost —
    * the number the operator's contract is about. Same staleness caveats
    * as Engine.tableCache (the scratch files pin the first read's
    * listing). LRU-bounded like the other session memos — a long-lived
    * service cycling sessions/sfDirs ages old indexes out instead of
    * pinning them — and an aged-out index's two scratch parquet dirs are
    * deleted on eviction (after Scratch.delete's quiescence wait) instead
    * of lingering until the JVM shutdown hook. Builds
    * run OUTSIDE the memo lock (getOrBuild): a second session's index
    * build never serializes behind the first's multi-job materialization.
    *
    * Eviction vs live readers: an index DataFrame is handed to callers
    * LAZILY (the declared query executes long after this cache returns),
    * so "capacity exceeds concurrently-active keys" was an asserted — not
    * enforced — precondition: a 9th concurrent (session, sfDir) key would
    * evict an index a running query is still scanning, and the eager
    * delete turned that into FAILED_READ task failures. Deletion is
    * therefore DEFERRED by a grace period (`spark.graft.
    * archiveEvictGraceSec`, default 900 s, 0 = eager) on a daemon timer:
    * disk stays bounded (reclaimed grace seconds after eviction, with the
    * Scratch session shutdown hook as the JVM-exit backstop) and a reader
    * racing an eviction would have to run a single query longer than the
    * grace window to observe a missing file.
    */
  private lazy val archiveEvictTimer =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-archive-evict"); th.setDaemon(true); th
    })
  private val archiveIndexCache =
    new graft.LruMap[(SparkSession, String), (Dedup.ArchiveIndex, Seq[String])](8,
      onEvict = { case ((spark, _), (_, dirs)) =>
        val reclaim: Runnable = () =>
          if (!spark.sparkContext.isStopped)
            dirs.foreach(d => try Scratch.delete(spark, d)
              catch { case _: Throwable => () })
        val graceSec =
          try spark.conf.getOption("spark.graft.archiveEvictGraceSec")
            .map(_.toLong).getOrElse(900L)
          catch { case _: Throwable => 900L } // stopped session: default
        if (graceSec <= 0) reclaim.run()
        else {
          archiveEvictTimer.schedule(reclaim, graceSec,
            java.util.concurrent.TimeUnit.SECONDS)
          ()
        }
      })

  private val all = Seq.newBuilder[Declared]
  private def declare(name: String, oracle: String = null)(
      fn: (SparkSession, String) => DataFrame): Unit =
    all += Declared(name, fn, Option(oracle))

  /** Documents corpus with 20 planted exact duplicates (ids +10000) — the
    * synthetic corpus has no natural exact dups, so the dedup queries plant
    * their own, reproducibly on both engines.
    */
  private def plantedCorpus(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text")
      .union(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))

  private val plantedCorpusSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20)"""

  // ------------------------------------------------------------ dedup
  declare("dedup_exact",
    s"""WITH corpus AS (SELECT * FROM $plantedCorpusSql c(doc_id, text)),
        h AS (SELECT doc_id, md5(text) hh FROM corpus),
        g AS (SELECT hh, MIN(doc_id) kept_id, COUNT(*) n FROM h GROUP BY 1 HAVING COUNT(*) > 1)
        SELECT h.doc_id AS dup_id, g.kept_id
        FROM h JOIN g USING (hh) WHERE h.doc_id != g.kept_id
        ORDER BY dup_id""") { (spark, sfDir) =>
    Dedup.exact(plantedCorpus(t(spark, sfDir, "documents"))).orderBy("dup_id")
  }

  declare("dedup_minhash_lsh",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a, b, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) AS jaccard
       FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
       WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8
       ORDER BY a, b""") { (spark, sfDir) =>
    Dedup.minhashLsh(t(spark, sfDir, "documents"), threshold = 0.8).orderBy("a", "b")
  }

  // Char-5-gram Jaccard near-dup (hardened round 16): the corpus plants a
  // TAIL-TRUNCATED near-copy of every >=200-char doc under doc_id 120
  // (doc 40000+i = doc i minus its last 15 chars) — char-gram Jaccard of
  // each planted pair is >= ~0.9, so the gate entry carries real pair
  // mass at every SF instead of vacuously agreeing on zero rows (the
  // round-15 verdict's finding: at sf0.01 no natural pair reaches 0.5).
  declare("dedup_ngram_jaccard",
    """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
       d AS (SELECT * FROM d0
             UNION ALL
             SELECT doc_id + 40000, substr(text, 1, length(text) - 15)
             FROM d0 WHERE length(text) >= 200),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(length(text)-4, 0)),
                 i -> substr(text, i, 5)) gs FROM d),
       sh AS (SELECT DISTINCT doc_id, unnest(gs) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a, b, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) AS jaccard
       FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
       WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.5
       ORDER BY a, b""") { (spark, sfDir) =>
    // Uncapped candidate generation: the oracle computes the exact
    // predicate, so the engine must not prefix-filter hot shingles here.
    val d0 = t(spark, sfDir, "documents").filter(col("doc_id") < 120)
      .select("doc_id", "text")
    val planted = d0.filter(length(col("text")) >= 200)
      .select((col("doc_id") + 40000).as("doc_id"),
        col("text").substr(lit(1), length(col("text")) - 15).as("text"))
    Dedup.jaccardPairs(d0.union(planted),
      threshold = 0.5, n = 5, charGrams = true,
      maxShingleDf = Long.MaxValue).orderBy("a", "b")
  }

  // Asymmetric near-dup: shingle CONTAINMENT |A∩B|/min(|A|,|B|) — the
  // partial-copy measure Jaccard is blind to. The plant: for every
  // >=60-token doc under doc_id 40, doc 30000+i is its 12-token
  // EXCERPT, so (i, 30000+i) has containment 1.0 (every excerpt
  // shingle is in the source) while Jaccard <= 10/58 — far below any
  // dedup threshold; doc-level Jaccard dedup would ship the copied
  // excerpt as "novel" text. The oracle computes the same inverted
  // index + least(); the engine filters on the UNROUNDED measure and
  // rounds only the reported values.
  declare("dedup_containment",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       exc AS (SELECT doc_id + 30000 AS doc_id,
                 array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ') AS text
               FROM d WHERE len(string_split(text, ' ')) >= 60),
       corpus AS (SELECT * FROM d UNION ALL SELECT * FROM exc),
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM corpus),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a, b,
         round(CAST(i AS DOUBLE)/least(sa.sz, sb.sz), 3) AS containment,
         round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 3) AS jaccard
       FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
       WHERE CAST(i AS DOUBLE)/least(sa.sz, sb.sz) >= 0.9
       ORDER BY a, b""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents").filter(col("doc_id") < 40)
      .select("doc_id", "text")
    val exc = d.filter(size(split(col("text"), " ")) >= 60)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text"))
    Dedup.containmentPairs(d.union(exc), threshold = 0.9,
        maxShingleDf = Long.MaxValue)
      .select(col("a"), col("b"),
        round(col("containment"), 3).as("containment"),
        round(col("jaccard"), 3).as("jaccard"))
      .orderBy("a", "b")
  }

  declare("dedup_corpus",
    """WITH corpus AS (SELECT doc_id, text FROM documents
         UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20),
       keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text))
       SELECT doc_id FROM corpus WHERE doc_id IN (SELECT doc_id FROM keep)
       ORDER BY doc_id""") { (spark, sfDir) =>
    // End-to-end dedup at threshold 1.0: plant 20 exact duplicates, keep
    // each hash group's min id. The oracle computes the TRUE min-per-hash
    // survivors rather than assuming only the planted copies collide — at
    // sf0.1 the synthetic corpus contains natural exact duplicates too,
    // which the engine correctly removes.
    Dedup.deduplicate(plantedCorpus(t(spark, sfDir, "documents")), threshold = 1.0)
      .select("doc_id").orderBy("doc_id")
  }

  // The REAL near-dup path of deduplicate (LSH candidates -> exact verify
  // -> min-label propagation to convergence -> anti-join), checked against
  // a DuckDB connected-components oracle built from the exact Jaccard
  // predicate + a recursive-CTE transitive closure. dedup_corpus above
  // covers the threshold-1.0 exact fast path; this covers everything else.
  declare("dedup_corpus_near",
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1)
       SELECT doc_id FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM lab WHERE doc_id != label)
       ORDER BY doc_id""") { (spark, sfDir) =>
    Dedup.deduplicate(t(spark, sfDir, "documents"), threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  declare("dedup_clusters",
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1),
       alllab AS (SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS label
                  FROM documents d LEFT JOIN lab l USING (doc_id)),
       cl AS (SELECT label, COUNT(*) AS sz FROM alllab GROUP BY 1)
       SELECT sz AS cluster_size, COUNT(*) AS n_clusters
       FROM cl GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // Connected components as a first-class result: the cluster-size
    // distribution of the near-dup graph (how much of the corpus is
    // singleton vs duplicated), vs the recursive-CTE transitive closure.
    Dedup.componentLabels(t(spark, sfDir, "documents"), threshold = 0.8)
      .groupBy("label").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")
  }

  declare("dedup_canonical",
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1),
       alllab AS (SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS label,
                    length(d.text) AS len
                  FROM documents d LEFT JOIN lab l USING (doc_id))
       SELECT label, arg_max(doc_id, len * 1000000000000 - doc_id) AS canonical_id,
         COUNT(*) AS n_members, MAX(len) AS max_len
       FROM alllab GROUP BY 1 HAVING COUNT(*) > 1
       ORDER BY label""") { (spark, sfDir) =>
    // Canonical-document election: per near-dup cluster keep the LONGEST
    // member (tie → lowest id) — the realistic keep policy (richest copy
    // wins), expressed as a row-local max_by over the component labels.
    val docs = t(spark, sfDir, "documents")
    Dedup.componentLabels(docs, threshold = 0.8)
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")),
        Seq("doc_id"))
      .groupBy("label")
      .agg(max_by(col("doc_id"), col("len") * 1000000000000L - col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_members"), max("len").as("max_len"))
      .filter(col("n_members") > 1)
      .orderBy("label")
  }

  declare("dedup_incremental_near",
    """WITH RECURSIVE
       known AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       newd AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200),
       kh AS (SELECT DISTINCT md5(text) h FROM known),
       nh AS (SELECT doc_id, md5(text) h FROM newd),
       kept0 AS (SELECT MIN(doc_id) AS doc_id FROM nh
                 WHERE h NOT IN (SELECT h FROM kh) GROUP BY h),
       ta AS (SELECT d.doc_id, string_split(d.text, ' ') ws
              FROM newd d JOIN kept0 USING (doc_id)),
       sa0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM ta),
       sha AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sa0),
       tb AS (SELECT doc_id, string_split(text, ' ') ws FROM known),
       sb0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM tb),
       shb AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sb0),
       sza AS (SELECT doc_id, COUNT(*) sz FROM sha GROUP BY 1),
       szb AS (SELECT doc_id, COUNT(*) sz FROM shb GROUP BY 1),
       crossi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                  FROM sha x JOIN shb y ON x.shingle = y.shingle GROUP BY 1, 2),
       dupk AS (SELECT DISTINCT a AS doc_id FROM crossi
                JOIN sza ON a = sza.doc_id JOIN szb ON b = szb.doc_id
                WHERE CAST(i AS DOUBLE)/(sza.sz + szb.sz - i) >= 0.8),
       selfi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sha x JOIN sha y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 WHERE x.doc_id NOT IN (SELECT doc_id FROM dupk)
                   AND y.doc_id NOT IN (SELECT doc_id FROM dupk)
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM selfi
                 JOIN sza s1 ON a = s1.doc_id JOIN sza s2 ON b = s2.doc_id
                 WHERE CAST(i AS DOUBLE)/(s1.sz + s2.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1)
       SELECT doc_id FROM kept0
       WHERE doc_id NOT IN (SELECT doc_id FROM dupk)
         AND doc_id NOT IN (SELECT doc_id FROM lab WHERE doc_id != label)
       ORDER BY doc_id""") { (spark, sfDir) =>
    // Incremental near-dup: the archive is docs < 200, the crawl increment
    // everything else; the increment is screened exact-then-near against
    // the archive and deduplicated within itself (Dedup.incrementalNear).
    // The oracle recomputes all three stages from the exact Jaccard
    // predicate + a recursive-CTE closure for the within-batch components.
    val d = t(spark, sfDir, "documents")
    Dedup.incrementalNear(
        d.filter(col("doc_id") >= 200).select("doc_id", "text"),
        d.filter(col("doc_id") < 200).select("doc_id", "text"),
        threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  // Streaming incremental dedup (round 16): the crawl-pipeline production
  // shape under the REAL streaming engine — the increment (docs < 200)
  // lands as four single-file micro-batches (maxFilesPerTrigger=1,
  // Trigger.AvailableNow), each screened against a STANDING archive index
  // seeded from docs >= 200 and upserted per batch via foreachBatch
  // (StreamingDedup). Semantics are greedy-vs-everything-SEEN (dropped
  // docs index too), which makes the kept set independent of batch
  // boundaries (1-batch == 4-batch, spec-pinned) and gives the oracle a
  // CLOSED non-recursive form: keep d iff no archive doc and no
  // smaller-id increment doc shares its hash or reaches Jaccard 0.8.
  declare("dedup_streaming_near",
    """WITH known AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200),
       newd AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       kh AS (SELECT DISTINCT md5(text) h FROM known),
       nh AS (SELECT doc_id, md5(text) h FROM newd),
       exdrop AS (SELECT doc_id FROM nh WHERE h IN (SELECT h FROM kh)
                  UNION
                  SELECT b.doc_id FROM nh a JOIN nh b
                  ON a.h = b.h AND a.doc_id < b.doc_id),
       ta AS (SELECT doc_id, string_split(text, ' ') ws FROM newd),
       sa0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM ta),
       sha AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sa0),
       tb AS (SELECT doc_id, string_split(text, ' ') ws FROM known),
       sb0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM tb),
       shb AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sb0),
       sza AS (SELECT doc_id, COUNT(*) sz FROM sha GROUP BY 1),
       szb AS (SELECT doc_id, COUNT(*) sz FROM shb GROUP BY 1),
       crossi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                  FROM sha x JOIN shb y ON x.shingle = y.shingle GROUP BY 1, 2),
       selfi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sha x JOIN sha y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       neardrop AS (
         SELECT a AS doc_id FROM crossi
         JOIN sza ON a = sza.doc_id JOIN szb ON b = szb.doc_id
         WHERE CAST(i AS DOUBLE)/(sza.sz + szb.sz - i) >= 0.8
         UNION
         SELECT b AS doc_id FROM selfi
         JOIN sza s1 ON a = s1.doc_id JOIN sza s2 ON b = s2.doc_id
         WHERE CAST(i AS DOUBLE)/(s1.sz + s2.sz - i) >= 0.8)
       SELECT doc_id FROM newd
       WHERE doc_id NOT IN (SELECT doc_id FROM exdrop)
         AND doc_id NOT IN (SELECT doc_id FROM neardrop)
       ORDER BY doc_id""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents")
    val inc = d.filter(col("doc_id") < 200).select("doc_id", "text")
    val known = d.filter(col("doc_id") >= 200).select("doc_id", "text")
    val (staging, schema) = graft.streaming.StreamingDedup.stageBatches(
      inc, 4, i => (i * 50L, (i + 1) * 50L))
    graft.streaming.StreamingDedup
      .runFileStream(spark, staging, schema, known, threshold = 0.8)
      .orderBy("doc_id")
  }

  declare("dedup_incremental_near_idx",
    // The same operator driven through the precomputed-ArchiveIndex path
    // AND the production crawl shape: the ARCHIVE is the bulk of the
    // corpus (docs >= 200) and the increment is small (docs < 200) — the
    // inverse of dedup_incremental_near's split, so together the two
    // queries cover both regimes. The archive's band table and hash set
    // are materialized once to scratch — standing in for the persisted
    // bucketed tables of a daily crawl — and every archive signature the
    // operator probes comes from them, never from a rescan of archive
    // text; with a big archive that rescan would dominate, which is
    // exactly what the index exists to delete.
    """WITH RECURSIVE
       known AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200),
       newd AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       kh AS (SELECT DISTINCT md5(text) h FROM known),
       nh AS (SELECT doc_id, md5(text) h FROM newd),
       kept0 AS (SELECT MIN(doc_id) AS doc_id FROM nh
                 WHERE h NOT IN (SELECT h FROM kh) GROUP BY h),
       ta AS (SELECT d.doc_id, string_split(d.text, ' ') ws
              FROM newd d JOIN kept0 USING (doc_id)),
       sa0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM ta),
       sha AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sa0),
       tb AS (SELECT doc_id, string_split(text, ' ') ws FROM known),
       sb0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) sh FROM tb),
       shb AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sb0),
       sza AS (SELECT doc_id, COUNT(*) sz FROM sha GROUP BY 1),
       szb AS (SELECT doc_id, COUNT(*) sz FROM shb GROUP BY 1),
       crossi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                  FROM sha x JOIN shb y ON x.shingle = y.shingle GROUP BY 1, 2),
       dupk AS (SELECT DISTINCT a AS doc_id FROM crossi
                JOIN sza ON a = sza.doc_id JOIN szb ON b = szb.doc_id
                WHERE CAST(i AS DOUBLE)/(sza.sz + szb.sz - i) >= 0.8),
       selfi AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sha x JOIN sha y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 WHERE x.doc_id NOT IN (SELECT doc_id FROM dupk)
                   AND y.doc_id NOT IN (SELECT doc_id FROM dupk)
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM selfi
                 JOIN sza s1 ON a = s1.doc_id JOIN sza s2 ON b = s2.doc_id
                 WHERE CAST(i AS DOUBLE)/(s1.sz + s2.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1)
       SELECT doc_id FROM kept0
       WHERE doc_id NOT IN (SELECT doc_id FROM dupk)
         AND doc_id NOT IN (SELECT doc_id FROM lab WHERE doc_id != label)
       ORDER BY doc_id""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents")
    val inc = d.filter(col("doc_id") < 200).select("doc_id", "text")
    val known = d.filter(col("doc_id") >= 200).select("doc_id", "text")
    val (index, _) = archiveIndexCache.getOrBuild((spark, sfDir)) {
      val built = Dedup.buildArchiveIndex(known)
      val (bandsDf, bandsDir) = Scratch.materialize(built.bands, "aix_bands")
      val (hashesDf, hashesDir) = Scratch.materialize(built.hashes, "aix_hashes")
      (Dedup.ArchiveIndex(bandsDf, hashesDf,
        built.numHashes, built.numBands, built.shingleN),
        Seq(bandsDir, hashesDir))
    } { case (_, dirs) => dirs.foreach(Scratch.delete(spark, _)) }
    Dedup.incrementalNear(inc, known, index, threshold = 0.8)
      .select("doc_id").orderBy("doc_id")
  }

  // Time-series gap-fill (round 15): the regular-grid + forward-fill
  // (LOCF) shape every metrics pipeline materializes — per-key hour
  // grid from generate_series, last-observation-carried-forward via
  // ASOF LEFT JOIN, leading grid points NULL. One statement, IDENTICAL
  // text on both engines: DuckDB runs its native ASOF; here the same
  // text composes three dialect lanes (temporal generate_series, the
  // select-list unnest, and the ASOF rewrite onto the linear asof_join
  // TVF — union + one hash shuffle, no join operator, plan-asserted in
  // QueryPlanSpec's as-of audit).
  declare("events_gapfill",
    """CREATE OR REPLACE TEMP TABLE gf_b AS
         SELECT user_id, ts, value FROM events
         WHERE event_type = 'purchase' AND user_id < 5;
       CREATE OR REPLACE TEMP TABLE gf_grid AS
         SELECT user_id,
                unnest(generate_series(date_trunc('hour', mn),
                  date_trunc('hour', mx), INTERVAL 6 HOUR)) AS gts
         FROM (SELECT user_id, MIN(ts) mn, MAX(ts) mx FROM gf_b GROUP BY 1) s;
       SELECT g.user_id, g.gts, value
       FROM gf_grid g ASOF LEFT JOIN gf_b b
         ON g.user_id = b.user_id AND g.gts >= b.ts
       ORDER BY 1, 2""") { (spark, sfDir) =>
    t(spark, sfDir, "events").createOrReplaceTempView("events")
    Seq(
      """CREATE OR REPLACE TEMP TABLE gf_b AS
         SELECT user_id, ts, value FROM events
         WHERE event_type = 'purchase' AND user_id < 5""",
      """CREATE OR REPLACE TEMP TABLE gf_grid AS
         SELECT user_id,
                unnest(generate_series(date_trunc('hour', mn),
                  date_trunc('hour', mx), INTERVAL 6 HOUR)) AS gts
         FROM (SELECT user_id, MIN(ts) mn, MAX(ts) mx FROM gf_b GROUP BY 1) s"""
    ).foreach(s => spark.sql(s).collect())
    spark.sql(
      """SELECT g.user_id, g.gts, value
         FROM gf_grid g ASOF LEFT JOIN gf_b b
           ON g.user_id = b.user_id AND g.gts >= b.ts
         ORDER BY 1, 2""")
  }

  // Weekly cohort retention (round 15): users bucketed by first-event
  // week; per (cohort, offset) the count still active — the retention
  // triangle. Everything keys on user_id (two map-side-combined aggs +
  // one co-partitioned join); final fold is weeks², tiny. Monday-based
  // date_trunc(week) agrees across engines; the day-diff is always a
  // multiple of 7 so the //7 is exact.
  declare("events_retention",
    """WITH fs AS (SELECT user_id u, CAST(date_trunc('week', MIN(ts)) AS DATE) cohort_week
                   FROM events GROUP BY 1),
       act AS (SELECT DISTINCT user_id u, CAST(date_trunc('week', ts) AS DATE) act_week
               FROM events)
       SELECT cohort_week, CAST((act_week - cohort_week) // 7 AS BIGINT) week_offset,
         COUNT(*) n_users
       FROM act JOIN fs USING (u)
       GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    Behavior.weeklyRetention(t(spark, sfDir, "events"))
      .orderBy("cohort_week", "week_offset")
  }

  // Ordered conversion funnel (round 15): signup → view → purchase, the
  // later steps within 30 days of the user's FIRST signup, each step
  // strictly after the previous (greedy mins — a user converts iff any
  // ordered chain exists). k−1 cascaded user-keyed join+min aggs: no
  // events self-join on time, no per-user sort; state per stage is one
  // timestamp per surviving user.
  declare("events_funnel",
    """WITH s1 AS (SELECT user_id u, MIN(ts) t1 FROM events
                   WHERE event_type = 'signup' GROUP BY 1),
       d1 AS (SELECT u, t1, t1 + INTERVAL 30 DAY AS deadline FROM s1),
       s2 AS (SELECT d1.u, MIN(e.ts) t2, MIN(d1.deadline) deadline
              FROM events e JOIN d1 ON e.user_id = d1.u
              WHERE e.event_type = 'view' AND e.ts > d1.t1 AND e.ts <= d1.deadline
              GROUP BY 1),
       s3 AS (SELECT s2.u, MIN(e.ts) t3
              FROM events e JOIN s2 ON e.user_id = s2.u
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2 AND e.ts <= s2.deadline
              GROUP BY 1)
       SELECT CAST(1 AS BIGINT) step_idx, 'signup' step, COUNT(*) n_users FROM s1
       UNION ALL
       SELECT CAST(2 AS BIGINT), 'view', COUNT(*) FROM s2
       UNION ALL
       SELECT CAST(3 AS BIGINT), 'purchase', COUNT(*) FROM s3
       ORDER BY step_idx""") { (spark, sfDir) =>
    Behavior.funnel(t(spark, sfDir, "events"),
        steps = Seq("signup", "view", "purchase"), windowDays = 30)
      .orderBy("step_idx")
  }

  // Batch sessionization (round 15): the batch counterpart of the
  // streaming session windows, for backfills — new session when the
  // inactivity gap strictly exceeds 12h. One window pass partitioned BY
  // USER (hash-distributed; per-user sort is user-history-sized, never
  // corpus-sized), ties broken by event_id; duration is the shared
  // floor-epoch convention.
  declare("events_sessions_batch",
    """WITH o AS (SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev FROM events),
       g AS (SELECT user_id, ts,
               SUM(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 720 MINUTE
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_id
             FROM o)
       SELECT user_id, CAST(session_id AS BIGINT) session_id, COUNT(*) n_events,
         MIN(ts) start_ts,
         CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) duration_secs
       FROM g GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    Behavior.sessionize(t(spark, sfDir, "events"), gapMinutes = 720)
      .orderBy("user_id", "session_id")
  }

  // Filter-ablation overlap matrix (round 15): before committing to a
  // filter stack, which rule removes what and how much the removals
  // OVERLAP (a filter whose removals are a subset of another's is
  // free to drop). Three production rules — gopher keep, blocklist
  // hit, short-doc — as row-local verdicts; the matrix is a doc-keyed
  // self-join of the removed-long-table (≤ filters × docs rows,
  // co-partitioned), output filters²-small. Diagonal = per-filter
  // removed totals.
  declare("quality_ablation",
    """WITH q AS (SELECT doc_id, text, string_split(text, ' ') ws,
                         string_split(text, chr(10)) ls FROM documents),
       c AS (SELECT doc_id, ws,
         CAST(len(ws) AS BIGINT) n_words,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) n_word_chars,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) n_alpha_words,
         CAST(len(list_filter(ws, w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS BIGINT) n_stop,
         CAST((length(text) - length(replace(text, '#', ''))) / 1
            + (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) n_sym,
         CAST(len(ls) AS BIGINT) n_lines,
         CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) n_bullet,
         CAST(len(list_filter(ls, l -> ends_with(l, '...'))) AS BIGINT) n_ellipsis
         FROM q),
       v AS (SELECT doc_id,
         NOT ((n_words BETWEEN 50 AND 100000)
           AND n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10
           AND n_sym * 10 <= n_words
           AND n_bullet * 10 <= n_lines * 9
           AND n_ellipsis * 10 <= n_lines * 3
           AND n_alpha_words * 5 >= n_words * 4
           AND n_stop >= 2) AS r_gopher,
         len(list_filter(ws, w -> list_contains(['slow','dup','big'], w))) > 0 AS r_blocklist,
         n_words < 30 AS r_short
         FROM c),
       lng AS (SELECT doc_id, 'blocklist' f FROM v WHERE r_blocklist
               UNION ALL SELECT doc_id, 'gopher' FROM v WHERE r_gopher
               UNION ALL SELECT doc_id, 'short' FROM v WHERE r_short)
       SELECT a.f fa, b.f fb, COUNT(*) n_removed_both
       FROM lng a JOIN lng b ON a.doc_id = b.doc_id AND a.f <= b.f
       GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    val docs = t(spark, sfDir, "documents")
    val g = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), (!col("keep")).as("removed"), lit("gopher").as("f"))
    val b = TextAnalysis.blocklistFilter(docs, Seq("slow", "dup", "big"))
      .select(col("doc_id"), (col("n_hits") > 0).as("removed"), lit("blocklist").as("f"))
    val s = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) < 30).as("removed"), lit("short").as("f"))
    val lng = g.unionByName(b).unionByName(s).filter(col("removed"))
      .select("doc_id", "f")
    lng.as("a").join(lng.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.f") <= col("b.f"))
      .groupBy(col("a.f").as("fa"), col("b.f").as("fb"))
      .agg(count(lit(1)).as("n_removed_both"))
      .orderBy("fa", "fb")
  }

  // Hourly anomaly detection (round 15): hours whose event count sits
  // more than 2σ from the hourly mean — flagged with EXACT INTEGER
  // arithmetic: (n·H − tot)² > 4·(H·ss − tot²) is (n−μ)² > 4σ² with
  // both sides cross-multiplied by H² (counts are integers, so tot and
  // ss = Σn² are exact integer sums — no float mean/variance whose
  // summation order could differ across engines; BIGINT headroom holds
  // to ~10⁹ n·H). Two tiny aggregates over the hour table.
  declare("events_anomaly_hours",
    """WITH hrs AS (SELECT date_trunc('hour', ts) h, COUNT(*) n FROM events GROUP BY 1),
       stats AS (SELECT CAST(COUNT(*) AS BIGINT) hh, CAST(SUM(n) AS BIGINT) tot,
                   CAST(SUM(n*n) AS BIGINT) ss FROM hrs)
       SELECT h, CAST(n AS BIGINT) n
       FROM hrs CROSS JOIN stats
       WHERE (n*hh - tot)*(n*hh - tot) > 4*(hh*ss - tot*tot)
       ORDER BY h""") { (spark, sfDir) =>
    val hrs = t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val stats = hrs.agg(count(lit(1)).cast("long").as("hh"),
      sum("n").cast("long").as("tot"),
      sum(col("n") * col("n")).cast("long").as("ss"))
    hrs.crossJoin(broadcast(stats))
      .filter((col("n") * col("hh") - col("tot")) * (col("n") * col("hh") - col("tot"))
        > lit(4) * (col("hh") * col("ss") - col("tot") * col("tot")))
      .select(col("h"), col("n").cast("long").as("n"))
      .orderBy("h")
  }

  // IVF cell-occupancy report (round 15): the index-balance diagnostic
  // an ANN deploy reads before trusting its nProbe recall math — rows
  // per cell plus each cell's per-mille share (a hot cell means probes
  // scan far more than corpus/cells). Assignment is the same row-local
  // broadcast-codebook argmax the search path uses; the report is one
  // map-side-combined aggregate.
  declare("sim_ivf_occupancy",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       vc AS (SELECT a.vec_id, c.vec_id cid,
                round(SUM(CAST(a.v AS DOUBLE)*CAST(c.v AS DOUBLE))/(na.nn*nc2.nn), 6) csim
              FROM x a JOIN x c ON a.i = c.i AND c.vec_id < 16
              JOIN norms na ON a.vec_id = na.vec_id
              JOIN norms nc2 ON c.vec_id = nc2.vec_id
              GROUP BY a.vec_id, c.vec_id, na.nn, nc2.nn),
       asg AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
                 FROM vc) WHERE rn = 1),
       occ AS (SELECT cid, COUNT(*) n FROM asg GROUP BY 1),
       tot AS (SELECT SUM(n) t FROM occ)
       SELECT cid, CAST(n AS BIGINT) n_vectors,
         CAST(floor(n * 1000.0 / t) AS BIGINT) share_millis
       FROM occ CROSS JOIN tot ORDER BY cid""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val occ = Similarity.assignToCentroids(e, e.filter(col("vec_id") < 16))
      .groupBy("cid").agg(count(lit(1)).as("n"))
    val tot = occ.agg(sum("n").as("t"))
    occ.crossJoin(broadcast(tot))
      .select(col("cid"), col("n").cast("long").as("n_vectors"),
        floor(col("n") * 1000.0 / col("t")).cast("long").as("share_millis"))
      .orderBy("cid")
  }

  // Event-type transitions (round 15): the Markov path analysis over
  // sessionized streams — consecutive-event (from, to) edges within a
  // 12h-gap session, with each edge's per-mille share of its from-type's
  // outgoing mass. Session lag restarts at boundaries, so "next" never
  // crosses a visit.
  declare("events_transitions",
    """WITH o AS (SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev FROM events),
       g AS (SELECT user_id, event_id, ts, event_type,
               SUM(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 720 MINUTE
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
             FROM o),
       e AS (SELECT lag(event_type) OVER (PARTITION BY user_id, sid
               ORDER BY ts, event_id) from_type, event_type to_type FROM g),
       edges AS (SELECT from_type, to_type, COUNT(*) n FROM e
                 WHERE from_type IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT from_type, SUM(n) tot FROM edges GROUP BY 1)
       SELECT from_type, to_type, CAST(n AS BIGINT) n,
         CAST(floor(n * 1000.0 / tot) AS BIGINT) share_millis
       FROM edges JOIN tot USING (from_type)
       ORDER BY from_type, to_type""") { (spark, sfDir) =>
    Behavior.transitions(t(spark, sfDir, "events"), gapMinutes = 720)
      .orderBy("from_type", "to_type")
  }

  // Token-budget selection (round 15): per language, the best documents
  // by unique-token-ratio quality until a 2000-token budget fills
  // (crossing doc included — the packShards greedy convention). The
  // per-group window runs on bounded-heap survivors (≤ budget+1 docs
  // per group per partition), never the corpus.
  declare("sample_token_budget",
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') ws FROM documents),
       q AS (SELECT doc_id, lang AS "group", CAST(len(ws) AS BIGINT) n_tok,
               CAST(floor(len(list_distinct(ws)) * 1000.0 / len(ws)) AS BIGINT) quality
             FROM d WHERE len(ws) > 0),
       r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY "group"
                 ORDER BY quality DESC, doc_id) AS BIGINT) rn,
               SUM(n_tok) OVER (PARTITION BY "group" ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok cum_before
             FROM q)
       SELECT "group", rn, doc_id, n_tok, quality FROM r WHERE cum_before < 2000
       ORDER BY "group", rn""") { (spark, sfDir) =>
    TextAnalysis.tokenBudgetSelect(t(spark, sfDir, "documents"),
        groupCol = "lang", budgetTokens = 2000L)
      .orderBy("group", "rn")
  }

  // Hapax share per source (round 15): what fraction (per-mille) of a
  // source's token occurrences are corpus-wide hapax legomena — the
  // vocab-health signal separating genuinely novel text from OCR/spam
  // noise (both inflate hapax, but against quality scores they split).
  // One corpus pass to the Zipf-small vocabulary, hapax set joined back
  // occurrence-side (AQE-sized), per-source fold map-side combined.
  declare("text_hapax_by_source",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) w FROM documents),
       tk AS (SELECT * FROM tok WHERE w <> ''),
       vocab AS (SELECT w, COUNT(*) f FROM tk GROUP BY 1),
       j AS (SELECT source, CASE WHEN f = 1 THEN 1 ELSE 0 END h FROM tk JOIN vocab USING (w))
       SELECT source, COUNT(*) n_tokens, CAST(SUM(h) AS BIGINT) n_hapax,
         CAST(floor(SUM(h) * 1000.0 / COUNT(*)) AS BIGINT) hapax_millis
       FROM j GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val tk = t(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = tk.groupBy("w").agg(count(lit(1)).as("f"))
    tk.join(vocab, Seq("w"))
      .select(col("source"), when(col("f") === 1, 1L).otherwise(0L).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("h").cast("long").as("n_hapax"),
        floor(sum("h") * 1000.0 / count(lit(1))).cast("long").as("hapax_millis"))
      .orderBy("source")
  }

  // Degree histogram of the lineitem graph (round 15): node counts per
  // log2 degree bucket — the shape check (hub mass, tail width) read
  // before trusting degree-ordered algorithms' cost estimates. Bucket
  // = bit length − 1 via bin() string length on BOTH engines — exact
  // integer/string ops (floor(log2(2^k)) could differ in the last ulp
  // across libms).
  declare("graph_degree_hist",
    """WITH raw AS (SELECT (l_orderkey * 7 + 1) % 100003 x,
                      (l_partkey * 13 + 5) % 100003 y,
                      (l_suppkey * 31 + 11) % 100003 z FROM lineitem),
       e0 AS (SELECT x u, y v FROM raw UNION ALL SELECT y, z FROM raw
              UNION ALL SELECT z, x FROM raw),
       e AS (SELECT DISTINCT least(u, v) a, greatest(u, v) b FROM e0 WHERE u != v),
       deg AS (SELECT n, COUNT(*) d FROM
               (SELECT a n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       b AS (SELECT n, CAST(length(bin(d)) - 1 AS BIGINT) bucket FROM deg)
       SELECT bucket, COUNT(*) n_nodes FROM b GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val raw = t(spark, sfDir, "lineitem").select(
        ((col("l_orderkey") * 7 + 1) % 100003).as("x"),
        ((col("l_partkey") * 13 + 5) % 100003).as("y"),
        ((col("l_suppkey") * 31 + 11) % 100003).as("z"))
      .select(explode(array(
        struct(col("x").as("u"), col("y").as("v")),
        struct(col("y").as("u"), col("z").as("v")),
        struct(col("z").as("u"), col("x").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val e = raw.select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .select((length(bin(col("d"))) - 1).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_nodes"))
      .orderBy("bucket")
  }

  // Skip-gram pair extraction (round 15): the word2vec data-prep pass —
  // deterministic frequency subsampling (md5-hex draw vs a per-word
  // ⌊√(t·N/f)·2³²⌋ threshold rendered as hex, the hashSplit trick) then
  // windowed pairs over the compacted kept sequence, folded to counts.
  // Vocabulary joins are AQE-sized; compaction windows by document.
  declare("tokens_skipgram_pairs",
    """WITH toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) word,
             generate_subscripts(string_split(text, ' '), 1) pos FROM documents),
       tk AS (SELECT * FROM toks0 WHERE word <> ''),
       vocab AS (SELECT word, COUNT(*) f FROM tk GROUP BY 1),
       tot AS (SELECT CAST(SUM(f) AS BIGINT) n_total FROM vocab),
       thr AS (SELECT word, printf('%08x', CAST(least(
                 floor(sqrt(CAST(0.001 AS DOUBLE) * n_total / f) * 4294967296.0),
                 4294967295.0) AS BIGINT)) thr
               FROM vocab CROSS JOIN tot),
       kept AS (SELECT doc_id, pos, tk.word FROM tk JOIN thr USING (word)
                WHERE substr(md5(doc_id || '_' || pos), 1, 8) < thr),
       sq AS (SELECT doc_id, word,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) cpos FROM kept),
       pairs AS (SELECT a.word center, b.word context FROM sq a JOIN sq b
                   ON a.doc_id = b.doc_id AND b.cpos = a.cpos + 1
                 UNION ALL
                 SELECT a.word, b.word FROM sq a JOIN sq b
                   ON a.doc_id = b.doc_id AND b.cpos = a.cpos + 2)
       SELECT center, context, COUNT(*) cnt FROM pairs GROUP BY 1, 2
       ORDER BY cnt DESC, center, context LIMIT 100""") { (spark, sfDir) =>
    TextAnalysis.skipgramPairs(t(spark, sfDir, "documents"),
      window = 2, t = 1e-3, topK = 100)
  }

  // Tokenizer fertility (round 15): per language, lexical units per
  // whitespace word (how much a BPE-ish tokenizer fragments each
  // language) and chars per lexical unit — the stats a multilingual
  // token-budget plan is priced with. One scan, row-local counts,
  // map-side-combined sums, exact-integer ratios.
  declare("tokens_fertility",
    """SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) n_words,
         CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) n_lex,
         CAST(floor(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) * 1000.0 /
              SUM(len(string_split(text, ' ')))) AS BIGINT) fertility_millis,
         CAST(floor(SUM(length(text)) * 1000.0 /
              SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))) AS BIGINT)
           chars_per_lex_millis
       FROM documents GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    t(spark, sfDir, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        size(TextAnalysis.regexTokens(col("text"))).cast("long").as("nl"),
        length(col("text")).cast("long").as("nc"))
      .groupBy("lang")
      .agg(sum("nw").as("n_words"), sum("nl").as("n_lex"),
        floor(sum("nl") * 1000.0 / sum("nw")).cast("long").as("fertility_millis"),
        floor(sum("nc") * 1000.0 / sum("nl")).cast("long").as("chars_per_lex_millis"))
      .orderBy("lang")
  }

  // Triangle counting (round 15): per-node triangle membership over a
  // deterministic lineitem-derived graph — each row plants the closed
  // triple (h(okey), h(pkey), h(skey)) in a 100003-node space, so
  // triangles exist at every SF while the graph stays SPARSE (a small
  // modulus goes dense as rows grow: at sf0.1, mod 3000 hit 33%
  // density and wedge closure exploded to ~10⁹ wedges/100 s — the
  // density, not the operator, was the cost). Engine: degree-ordered
  // wedge closure — Σ out-deg² ≤ O(m^1.5), the hub-proof orientation.
  // Oracle: the canonical a<b<c triple join, an independent
  // formulation of the same set.
  declare("graph_triangles",
    """WITH raw AS (SELECT (l_orderkey * 7 + 1) % 100003 x,
                      (l_partkey * 13 + 5) % 100003 y,
                      (l_suppkey * 31 + 11) % 100003 z FROM lineitem),
       e0 AS (SELECT x u, y v FROM raw UNION ALL SELECT y, z FROM raw
              UNION ALL SELECT z, x FROM raw),
       e AS (SELECT DISTINCT least(u, v) a, greatest(u, v) b FROM e0 WHERE u != v),
       tri AS (SELECT e1.a x, e1.b y, e2.b z
               FROM e e1 JOIN e e2 ON e2.a = e1.b
                         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
       SELECT node, COUNT(*) n_tri FROM (
         SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // one lineitem scan emits all three planted edges per row (the
    // 3-way union form scans the table three times).
    val edges = t(spark, sfDir, "lineitem").select(
        ((col("l_orderkey") * 7 + 1) % 100003).as("x"),
        ((col("l_partkey") * 13 + 5) % 100003).as("y"),
        ((col("l_suppkey") * 31 + 11) % 100003).as("z"))
      .select(explode(array(
        struct(col("x").as("u"), col("y").as("v")),
        struct(col("y").as("u"), col("z").as("v")),
        struct(col("z").as("u"), col("x").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    Triangles.perNode(edges).orderBy("node")
  }

  // PageRank (round 15): the crawl-prioritization score, 3 rounds of
  // INTEGER fixed-point PageRank over a deterministic orders-derived
  // graph (u = custkey, v = hash of orderkey into a 5000-node universe).
  // Integer contributions (r div outdeg) and damping ((85·s) div 100)
  // make the result bit-identical across engines and partitionings —
  // float PageRank can't be hash-compared (per-node Σ reorders). The
  // oracle unrolls the same three rounds as chained CTEs; the engine
  // iterates with scratch-materialized state (operators/PageRank).
  declare("graph_pagerank",
    """WITH edges AS (SELECT CAST(o_custkey AS BIGINT) u,
                CAST((o_orderkey * 7 + 3) % 5000 AS BIGINT) v FROM orders),
       deg AS (SELECT u, COUNT(*) d FROM edges GROUP BY 1),
       nodes AS (SELECT DISTINCT node FROM
                 (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)),
       r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) r FROM nodes),
       step1 AS (SELECT e.v AS node, SUM(r0.r // deg.d) s
                 FROM edges e JOIN r0 ON e.u = r0.node JOIN deg ON e.u = deg.u
                 GROUP BY 1),
       r1 AS (SELECT n.node, 150000000000 + (85 * COALESCE(s.s, 0)) // 100 AS r
              FROM nodes n LEFT JOIN step1 s ON n.node = s.node),
       step2 AS (SELECT e.v AS node, SUM(r1.r // deg.d) s
                 FROM edges e JOIN r1 ON e.u = r1.node JOIN deg ON e.u = deg.u
                 GROUP BY 1),
       r2 AS (SELECT n.node, 150000000000 + (85 * COALESCE(s.s, 0)) // 100 AS r
              FROM nodes n LEFT JOIN step2 s ON n.node = s.node),
       step3 AS (SELECT e.v AS node, SUM(r2.r // deg.d) s
                 FROM edges e JOIN r2 ON e.u = r2.node JOIN deg ON e.u = deg.u
                 GROUP BY 1),
       r3 AS (SELECT n.node, 150000000000 + (85 * COALESCE(s.s, 0)) // 100 AS r
              FROM nodes n LEFT JOIN step3 s ON n.node = s.node)
       SELECT node, CAST(r AS BIGINT) r FROM r3
       ORDER BY r DESC, node LIMIT 20""") { (spark, sfDir) =>
    val edges = t(spark, sfDir, "orders").select(
      col("o_custkey").cast("long").as("u"),
      ((col("o_orderkey") * 7 + 3) % 5000).cast("long").as("v"))
    PageRank.iterate(edges, iters = 3)
      .orderBy(desc("r"), asc("node")).limit(20)
  }

  declare("graph_reachability",
    """WITH RECURSIVE edges AS (
         SELECT CAST(n_nationkey AS BIGINT) u, CAST((n_nationkey*2+1)%25 AS BIGINT) v FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*3+2)%25 AS BIGINT) FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*5+4)%25 AS BIGINT) FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*7+6)%25 AS BIGINT) FROM nation
       ),
       reach(x) AS (
         SELECT CAST(0 AS BIGINT)
         UNION
         SELECT e.v FROM reach r JOIN edges e ON e.u = r.x
       )
       SELECT x FROM reach ORDER BY x""") { (spark, sfDir) =>
    // The WITH RECURSIVE-class host surface (Spark has no general
    // recursion): Fixpoint.iterate computes the same least fixpoint with
    // semi-naive rounds, checked against DuckDB's actual recursive CTE on
    // a deterministic functional graph over the nation table.
    val n = t(spark, sfDir, "nation")
    val edges = n.select(col("n_nationkey").cast("long").as("u"),
        ((col("n_nationkey") * 2 + 1) % 25).cast("long").as("v"))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 3 + 2) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 5 + 4) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 7 + 6) % 25).cast("long")))
    val seed = spark.range(1).select(lit(0L).as("x"))
    // buckets sized to the tiny closure (≤25 rows) exactly like sizing a
    // shuffle — the default (spark.sql.shuffle.partitions) pays one write
    // task + file per bucket per round for no benefit here; a 100 TB
    // closure would size it in the hundreds instead (ProfileFixpoint
    // measures the tradeoff).
    graft.operators.Fixpoint.iterate(seed,
        d => d.join(edges, d("x") === edges("u")).select(col("v").as("x")),
        buckets = 4)
      .orderBy("x")
  }

  // The LITERAL `WITH RECURSIVE` syntax, natively: Spark 4.1's parser and
  // optimizer host standard UNION ALL recursive CTEs (UnionLoop), so the
  // exact SQL a DuckDB user writes runs unchanged — the oracle below IS
  // the Spark query text modulo the nation view name. A linear data-driven
  // recursion (running sum walking the nation key chain) — Spark 4.1
  // rejects UNION-distinct recursion (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE),
  // so cyclic closures stay on the fixpoint() TVF, which is also the scale
  // path (bucketed semi-naive frontiers with co-located anti-joins) for
  // closures too big for a loop union.
  declare("recursive_cte_native_sql",
    """WITH RECURSIVE walk(k, s) AS (
         SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         UNION ALL
         SELECT CAST(n.n_nationkey AS BIGINT), w.s + CAST(n.n_regionkey AS BIGINT)
         FROM walk w JOIN nation n ON n.n_nationkey = w.k + 1
         WHERE w.k < 24
       )
       SELECT k, s FROM walk ORDER BY k""") { (spark, sfDir) =>
    t(spark, sfDir, "nation").createOrReplaceTempView("graft_rec_nation")
    spark.sql(
      """WITH RECURSIVE walk(k, s) AS (
           SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           UNION ALL
           SELECT CAST(n.n_nationkey AS BIGINT), w.s + CAST(n.n_regionkey AS BIGINT)
           FROM walk w JOIN graft_rec_nation n ON n.n_nationkey = w.k + 1
           WHERE w.k < 24
         )
         SELECT k, s FROM walk ORDER BY k""")
  }

  // The same least fixpoint driven ENTIRELY through SQL via the injected
  // fixpoint table function (sql/GraftSparkExtensions): what DuckDB
  // users write as WITH RECURSIVE, a SQL-only user of this engine writes
  // as `FROM fixpoint(seed, step_sql)` where the step references the
  // magic __frontier view. Same semi-naive engine and the same
  // recursive-CTE oracle as graph_reachability.
  declare("graph_reachability_sql",
    """WITH RECURSIVE edges AS (
         SELECT CAST(n_nationkey AS BIGINT) u, CAST((n_nationkey*2+1)%25 AS BIGINT) v FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*3+2)%25 AS BIGINT) FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*5+4)%25 AS BIGINT) FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), CAST((n_nationkey*7+6)%25 AS BIGINT) FROM nation
       ),
       reach(x) AS (
         SELECT CAST(0 AS BIGINT)
         UNION
         SELECT e.v FROM reach r JOIN edges e ON e.u = r.x
       )
       SELECT x FROM reach ORDER BY x""") { (spark, sfDir) =>
    val n = t(spark, sfDir, "nation")
    n.select(col("n_nationkey").cast("long").as("u"),
        ((col("n_nationkey") * 2 + 1) % 25).cast("long").as("v"))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 3 + 2) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 5 + 4) % 25).cast("long")))
      .union(n.select(col("n_nationkey").cast("long"),
        ((col("n_nationkey") * 7 + 6) % 25).cast("long")))
      .createOrReplaceTempView("graft_fp_edges")
    spark.range(1).select(lit(0L).as("x"))
      .createOrReplaceTempView("graft_fp_seed")
    spark.sql(
      """SELECT x FROM fixpoint('graft_fp_seed',
           'SELECT e.v AS x FROM __frontier f JOIN graft_fp_edges e ON e.u = f.x',
           64, 4)
         ORDER BY x""")
  }

  // SimHash oracle: the engine keys each token's 64 bits off md5(token)
  // (first 8 bytes, big-endian == first 16 hex chars), so DuckDB can
  // recompute the signatures exactly: one GROUP BY with 64 per-bit sums
  // (bit j set iff ones outnumber zeros), then the SAME pigeonhole chunk
  // join the engine uses (7 chunks x 9 bits for maxDist=6 — exact recall,
  // so banded output == the exact hamming<=6 predicate). No n^2 stage on
  // either side. Recall vs exact Jaccard pairs stays asserted in
  // PipelineSpec.
  private val simhashOracleSql: String = {
    val bitSums = (0 until 64)
      .map(j => s"SUM(CAST((h >> $j) & 1 AS BIGINT)) AS b$j")
      .mkString(", ")
    // Literal powers of two: DuckDB's << overflow-checks (1 << 63) even
    // on UBIGINT operands, so emit the decimal constants instead.
    val sigBits = (0 until 64)
      .map(j => s"CASE WHEN 2*b$j > n THEN ${BigInt(1) << j}::UBIGINT ELSE 0::UBIGINT END")
      .mkString(" + ")
    s"""WITH toks AS (
          SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
          FROM documents),
        th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
        agg AS (SELECT doc_id, COUNT(*) AS n, $bitSums FROM th GROUP BY doc_id),
        sigs AS (SELECT doc_id, ($sigBits) AS sig FROM agg),
        chunked AS (SELECT doc_id, sig, c, (sig >> (c*9)) & 511 AS cv
                    FROM sigs CROSS JOIN generate_series(0, 6) t(c)),
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb
                 FROM chunked x JOIN chunked y ON x.c = y.c AND x.cv = y.cv
                   AND x.doc_id < y.doc_id)
        SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 6
        ORDER BY a, b"""
  }

  declare("dedup_simhash", simhashOracleSql) { (spark, sfDir) =>
    Dedup.simhashPairs(t(spark, sfDir, "documents"), maxDist = 6).orderBy("a", "b")
  }

  declare("dedup_embedding_cosine",
    """SELECT a, b, CAST(1.0 AS DOUBLE) AS cos_sim FROM (
         SELECT vec_id AS a, vec_id + 10000 AS b FROM embeddings WHERE vec_id < 10
       ) ORDER BY a""") { (spark, sfDir) =>
    // Plant 10 exact duplicate vectors (the corpus has none naturally:
    // max natural pairwise cosine ~0.44), bucket by CORPUS-SIZE-AWARE
    // banded sign-LSH (bit depth from occupancy, band count from the
    // recall target — signLshParamsFor), verify exact cosine per bucket.
    // Identical vectors agree with every hyperplane, so recall on the
    // planted pairs is 1 under ANY banding; no random pair comes near the
    // 0.9999 threshold.
    val e = t(spark, sfDir, "embeddings")
    val corpus = e.select("vec_id", "embedding")
      .union(e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    Similarity.cosineDuplicatesAuto(corpus, threshold = 0.9999).orderBy("a")
  }

  declare("dedup_semantic",
    """SELECT vec_id FROM embeddings ORDER BY vec_id""") { (spark, sfDir) =>
    // Cluster-scoped semantic dedup (the SemDeDup recipe): k-means
    // buckets, within-cluster cosine verify, min-id survivor election.
    // Plant 10 exact duplicate vectors — identical vectors share every
    // argmax so each copy lands in its original's cluster and the pair
    // verifies at cosine 1.0; no natural pair approaches the 0.9999
    // threshold (max natural cosine ~0.44), so the oracle is exactly the
    // original corpus. The planted offset is DERIVED from max(vec_id)+1
    // (a fixed +20000 silently collides with natural ids at larger SFs —
    // the trap ProfileDedup fixed the same way) and k tracks the corpus
    // (~N/500, floor 16), keeping clusters at the documented
    // ~N/clusterSize contract at every SF; one tiny agg job up front.
    val e = t(spark, sfDir, "embeddings")
    val base = e.select("vec_id", "embedding")
    val st = base.agg(max("vec_id").cast("long"), count(lit(1))).head()
    val (offset, n) = (st.getLong(0) + 1, st.getLong(1))
    val corpus = base
      .union(e.filter(col("vec_id") < 10)
        .select((col("vec_id") + lit(offset)).as("vec_id"), col("embedding")))
    Similarity.semanticDeduplicate(corpus, k = math.max(16, (n / 500).toInt),
        threshold = 0.9999)
      .select("vec_id").orderBy("vec_id")
  }

  declare("embed_clusters",
    """SELECT node, label FROM (
         SELECT vec_id AS node, vec_id AS label FROM embeddings WHERE vec_id < 5
         UNION ALL SELECT vec_id + 10000, vec_id FROM embeddings WHERE vec_id < 5
         UNION ALL SELECT vec_id + 20000, vec_id FROM embeddings WHERE vec_id < 5
       ) ORDER BY node""") { (spark, sfDir) =>
    // Vector-side cluster parity with the text path: sign-LSH cosine pairs
    // → the SAME min-label propagation engine (componentsFromPairs). Plant
    // two extra copies of 5 vectors → clusters of size 3; identical
    // vectors share every LSH band, so each triple's three pairwise edges
    // all surface and propagation labels the triple with its min id. No
    // natural pair approaches the 0.9999 threshold (max natural cosine
    // ~0.44), so the oracle enumerates exactly the planted clusters.
    val e = t(spark, sfDir, "embeddings")
    val base = e.filter(col("vec_id") < 5).select("vec_id", "embedding")
    val corpus = e.select("vec_id", "embedding")
      .union(base.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      .union(base.select((col("vec_id") + 20000).as("vec_id"), col("embedding")))
    val pairs = Similarity.cosineDuplicatesAuto(corpus, threshold = 0.9999)
    Dedup.componentsFromPairs(pairs).orderBy("node")
  }

  // ------------------------------------------------- similarity search
  declare("sim_topk_brute",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                WHERE q.vec_id < 5 GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 10
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  declare("sim_topk_ivf",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       vc AS (SELECT a.vec_id, c.vec_id cid,
                round(SUM(CAST(a.v AS DOUBLE)*CAST(c.v AS DOUBLE))/(na.nn*nc2.nn), 6) csim
              FROM x a JOIN x c ON a.i = c.i AND c.vec_id < 16
              JOIN norms na ON a.vec_id = na.vec_id
              JOIN norms nc2 ON c.vec_id = nc2.vec_id
              GROUP BY a.vec_id, c.vec_id, na.nn, nc2.nn),
       asg AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
                 FROM vc) WHERE rn = 1),
       probes AS (SELECT vec_id query_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
                 FROM vc WHERE vec_id < 5) WHERE rn <= 4),
       cands AS (SELECT p.query_id, a.vec_id neighbor_id
                 FROM probes p JOIN asg a ON p.cid = a.cid
                 WHERE a.vec_id != p.query_id),
       dots AS (SELECT cd.query_id, cd.neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM cands cd
                JOIN x q ON q.vec_id = cd.query_id
                JOIN x c ON c.vec_id = cd.neighbor_id AND c.i = q.i
                GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 10
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5),
        centroids = e.filter(col("vec_id") < 16), k = 10, nProbe = 4)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  // IVF-PQ + EXACT RE-RANK (round 17) — the production ANN ladder's
  // last rung (IVFADC + re-ranking, Jégou et al. 2011): ADC shortlist
  // over (cid, codes) only, then exact cosine on the survivors' raw
  // embeddings (a q·shortlist fetch, never a corpus rescore). Declared
  // at the FULL parity setting (all buckets probed, shortlist ≥ corpus)
  // where the ladder's output provably equals brute force — the oracle
  // is the plain exact top-k, while the engine walks the whole
  // IVF+PQ+re-rank path; the pruned settings' recall envelope (re-rank
  // ≥ raw ADC at equal probe budget) is spec-pinned in PipelineSpec.
  declare("sim_topk_ivfpq_rerank",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                WHERE q.vec_id < 5 GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 10
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.ivfPqRerankTopK(e, e.filter(col("vec_id") < 5),
        centroids = e.filter(col("vec_id") < 16),
        codebookVecs = e.filter(col("vec_id") < 64), m = 4, k = 10,
        nProbe = 16, shortlist = 1000000)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  // ANN tuning grid (round 18, verdict stretch): the recall/scan-cost
  // table a 100 TB ANN deployment actually consults before picking
  // nProbe — per setting, EXACT-integer hits@10 vs brute force and the
  // candidate rows scanned. Both sides compute the full grid
  // independently (the oracle re-derives assignment, probe ranking,
  // and per-cell candidacy in SQL — same round-6 centroid ranking,
  // same round-3 scoring tie-breaks), so the recall numbers are
  // cross-engine-verified, not self-reported. All-integer output: no
  // float-compare hazard. The 4-point driver loop is a REPORT artifact
  // (each point is a distributed job; only 4 scalars come back).
  declare("sim_ann_recall_grid",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       qdots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                   SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                 FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                 WHERE q.vec_id < 5 GROUP BY 1, 2),
       qcos AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                FROM qdots JOIN norms nq ON query_id = nq.vec_id
                           JOIN norms nc ON neighbor_id = nc.vec_id),
       brute AS (SELECT query_id, neighbor_id FROM (
                   SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) rn FROM qcos)
                 WHERE rn <= 10),
       vc AS (SELECT a.vec_id, c.vec_id cid,
                round(SUM(CAST(a.v AS DOUBLE)*CAST(c.v AS DOUBLE))/(na.nn*nc2.nn), 6) csim
              FROM x a JOIN x c ON a.i = c.i AND c.vec_id < 16
              JOIN norms na ON a.vec_id = na.vec_id
              JOIN norms nc2 ON c.vec_id = nc2.vec_id
              GROUP BY a.vec_id, c.vec_id, na.nn, nc2.nn),
       asg AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cid) rn FROM vc) WHERE rn = 1),
       proberk AS (SELECT vec_id query_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY csim DESC, cid) prn
                   FROM vc WHERE vec_id < 5),
       grid AS (SELECT * FROM (VALUES (1),(2),(4),(8)) g(np)),
       cand AS (SELECT g.np, p.query_id, a.vec_id neighbor_id
                FROM grid g JOIN proberk p ON p.prn <= g.np
                JOIN asg a ON a.cid = p.cid
                WHERE a.vec_id != p.query_id),
       ivfk AS (SELECT np, query_id, neighbor_id FROM (
                  SELECT c.np, c.query_id, c.neighbor_id,
                    row_number() OVER (PARTITION BY c.np, c.query_id
                      ORDER BY q.sim DESC, c.neighbor_id) rn
                  FROM cand c JOIN qcos q ON q.query_id = c.query_id
                    AND q.neighbor_id = c.neighbor_id) WHERE rn <= 10),
       hits AS (SELECT np, count(*) h FROM ivfk
                JOIN brute USING (query_id, neighbor_id) GROUP BY 1),
       scn AS (SELECT np, count(*) s FROM cand GROUP BY 1)
       SELECT CAST(g.np AS BIGINT) AS nprobe,
         CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
         CAST((SELECT count(*) FROM brute) AS BIGINT) AS total,
         CAST(coalesce(scn.s, 0) AS BIGINT) AS scanned_rows,
         CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS corpus_rows
       FROM grid g LEFT JOIN hits h ON g.np = h.np
       LEFT JOIN scn ON g.np = scn.np
       ORDER BY nprobe""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
    val centroids = e.filter(col("vec_id") < 16)
    // Round-20 optimization pass: ONE assignment + ONE probe-ranked scan
    // for the whole nProbe grid (ivfTopKGrid — row-identical per point
    // to the previous per-nProbe ivfTopK loop, and its `scanned` counts
    // equal the lane's previous per-nProbe candidate counts, which were
    // rebuilt from a SECOND assignment + probe window per point). Brute
    // baseline materialized once.
    val nps = Seq(1, 2, 4, 8)
    val (brute, _) = graft.operators.Scratch.materialize(
      Similarity.bruteForceTopK(e, queries, k = 10)
        .select("query_id", "neighbor_id"), "grid_brute")
    val total = brute.count()
    val corpusN = e.count()
    val grid = Similarity.ivfTopKGrid(e, queries, centroids, k = 10,
      nProbes = nps)
    val hitByNp = grid.topK
      .select("nprobe", "query_id", "neighbor_id")
      .join(brute, Seq("query_id", "neighbor_id"))
      .groupBy("nprobe").agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scannedByNp = grid.scanned
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = nps.map(np => (np.toLong, hitByNp.getOrElse(np.toLong, 0L),
      total, scannedByNp.getOrElse(np.toLong, 0L), corpusN))
    import spark.implicits._
    rows.toDF("nprobe", "hits", "total", "scanned_rows", "corpus_rows")
      .orderBy("nprobe")
  }

  // ANN shortlist grid (round 19, verdict-18 stretch #10): the SECOND
  // knob a 100 TB IVF-PQ-rerank deployment tunes — recall@10 vs the
  // ADC shortlist depth (how many PQ candidates get exact re-scoring).
  // nProbe = all 16 centroids so the IVF factor drops out and the grid
  // isolates the PQ-approximation/shortlist trade. The oracle
  // re-implements the WHOLE PQ path in SQL — subvector codeword
  // assignment (round-6 quantized squared L2, smallest codebook id on
  // ties, exactly functions/VectorExpressions.pqCodes), the ADC
  // distance (round-6 quantized TOTAL — the same quantization every
  // ranking path carries, making the shortlist rank replicable across
  // engines regardless of float-summation order), the shortlist cut
  // (adc asc, neighbor id asc), and the exact round-3 cosine re-rank —
  // so recall is cross-engine-verified, not self-reported. All-integer
  // output.
  declare("sim_ann_shortlist_grid",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       dims AS (SELECT CAST(max(i) AS INT) dim FROM x),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                WHERE q.vec_id < 5 GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       brute AS (SELECT query_id, neighbor_id FROM (
                   SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) rn FROM scored)
                 WHERE rn <= 10),
       cbx AS (SELECT vec_id cb_id, i, v FROM x WHERE vec_id < 64),
       bx AS (SELECT c.vec_id, b.cb_id,
                CAST(floor((c.i - 1) / (SELECT dim/4 FROM dims)) AS INT) s,
                round(SUM((CAST(c.v AS DOUBLE) - CAST(b.v AS DOUBLE))
                          * (CAST(c.v AS DOUBLE) - CAST(b.v AS DOUBLE))), 6) d
              FROM x c JOIN cbx b ON c.i = b.i GROUP BY 1, 2, 3),
       codes AS (SELECT vec_id, s, cb_id code FROM (
                   SELECT vec_id, s, cb_id,
                     row_number() OVER (PARTITION BY vec_id, s
                       ORDER BY d, cb_id) rn FROM bx) WHERE rn = 1),
       adc AS (SELECT q.vec_id query_id, cd.vec_id neighbor_id,
                 round(SUM((CAST(q.v AS DOUBLE) - CAST(b.v AS DOUBLE))
                           * (CAST(q.v AS DOUBLE) - CAST(b.v AS DOUBLE))), 6) ad
               FROM x q
               JOIN cbx b ON q.i = b.i
               JOIN codes cd ON cd.s =
                   CAST(floor((q.i - 1) / (SELECT dim/4 FROM dims)) AS INT)
                 AND cd.code = b.cb_id
               WHERE q.vec_id < 5 AND cd.vec_id != q.vec_id
               GROUP BY 1, 2),
       shortl AS (SELECT query_id, neighbor_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY ad, neighbor_id) srn FROM adc),
       grid AS (SELECT * FROM (VALUES (10),(50),(200)) g(sl)),
       cand AS (SELECT g.sl, s.query_id, s.neighbor_id
                FROM grid g JOIN shortl s ON s.srn <= g.sl),
       rr AS (SELECT sl, query_id, neighbor_id FROM (
                SELECT c.sl, c.query_id, c.neighbor_id,
                  row_number() OVER (PARTITION BY c.sl, c.query_id
                    ORDER BY sc.sim DESC, c.neighbor_id) rn
                FROM cand c JOIN scored sc ON sc.query_id = c.query_id
                  AND sc.neighbor_id = c.neighbor_id) WHERE rn <= 10),
       hits AS (SELECT sl, count(*) h FROM rr
                JOIN brute USING (query_id, neighbor_id) GROUP BY 1)
       SELECT CAST(g.sl AS BIGINT) AS shortlist,
         CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
         CAST((SELECT count(*) FROM brute) AS BIGINT) AS total
       FROM grid g LEFT JOIN hits h ON g.sl = h.sl
       ORDER BY shortlist""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 5)
    val centroids = e.filter(col("vec_id") < 16)
    val cb = e.filter(col("vec_id") < 64)
    // Round-20 optimization pass: ONE ADC pass + ONE rerank join for the
    // whole depth grid (ivfPqRerankTopKGrid — row-identical per depth to
    // the previous per-depth ivfPqRerankTopK loop, spec-pinned), and the
    // brute baseline materialized once instead of recomputed by each
    // depth's hits join + the total count.
    val sls = Seq(10, 50, 200)
    val (brute, _) = graft.operators.Scratch.materialize(
      Similarity.bruteForceTopK(e, queries, k = 10)
        .select("query_id", "neighbor_id"), "grid_brute")
    val total = brute.count()
    val hitBySl = Similarity.ivfPqRerankTopKGrid(e, queries, centroids, cb,
        m = 4, k = 10, nProbe = 16, shortlists = sls)
      .select("shortlist", "query_id", "neighbor_id")
      .join(brute, Seq("query_id", "neighbor_id"))
      .groupBy("shortlist").agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = sls.map(sl => (sl.toLong, hitBySl.getOrElse(sl.toLong, 0L), total))
    import spark.implicits._
    rows.toDF("shortlist", "hits", "total").orderBy("shortlist")
  }

  // Hard-negative mining (contrastive/retrieval training): per anchor,
  // the top-k most-similar vectors whose LABEL differs — the
  // highest-loss negatives a training batch wants; same-label
  // neighbors are false negatives and easy negatives teach nothing.
  // Same scale shape as sim_topk_brute (broadcast anchors, one
  // row-local corpus scan, bounded per-partition heaps); the oracle is
  // the brute query with the label-mismatch predicate in the join.
  declare("sim_hard_negatives",
    """WITH x AS (SELECT vec_id, label, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                                  AND q.label != c.label
                WHERE q.vec_id < 5 GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 10
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.hardNegatives(e, e.filter(col("vec_id") < 5), k = 10)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  // MMR diverse retrieval (round 15, Carbonell & Goldstein 1998): four
  // greedy picks maximizing 700·relevance − 300·max-sim-to-selected
  // (millis, exact integer, ties → lowest id) against query vector 0 —
  // the dedup-at-retrieval a RAG context builder wants. The oracle
  // unrolls the greedy rounds over the pair matrix; the engine never
  // forms it (scratch relevance + k−1 broadcast-selected scans).
  declare("sim_mmr",
    """WITH e AS (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id >= 1 AND vec_id < 300),
       q0 AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM e),
       xq AS (SELECT unnest(embedding) v, generate_subscripts(embedding, 1) i FROM q0),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       qn AS (SELECT sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM xq),
       rel AS (SELECT a.vec_id,
                 CAST(round(SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE))/(na.nn*qn.nn)*1000, 0) AS BIGINT) r
               FROM x a JOIN xq b ON a.i = b.i
               JOIN norms na ON a.vec_id = na.vec_id CROSS JOIN qn
               GROUP BY a.vec_id, na.nn, qn.nn),
       mat AS (SELECT a.vec_id va, b.vec_id vb,
                 CAST(round(SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE))/(na.nn*nb.nn)*1000, 0) AS BIGINT) m
               FROM x a JOIN x b ON a.i = b.i
               JOIN norms na ON a.vec_id = na.vec_id
               JOIN norms nb ON b.vec_id = nb.vec_id
               GROUP BY a.vec_id, b.vec_id, na.nn, nb.nn),
       s1 AS (SELECT vec_id v, 700*r score FROM rel ORDER BY r DESC, vec_id LIMIT 1),
       d2 AS (SELECT va v, MAX(m) ms FROM mat JOIN s1 ON vb = s1.v GROUP BY 1),
       s2 AS (SELECT d2.v, 700*r - 300*ms score FROM d2 JOIN rel ON d2.v = rel.vec_id
              WHERE d2.v NOT IN (SELECT v FROM s1)
              ORDER BY score DESC, d2.v LIMIT 1),
       sel2 AS (SELECT v FROM s1 UNION ALL SELECT v FROM s2),
       d3 AS (SELECT va v, MAX(m) ms FROM mat WHERE vb IN (SELECT v FROM sel2) GROUP BY 1),
       s3 AS (SELECT d3.v, 700*r - 300*ms score FROM d3 JOIN rel ON d3.v = rel.vec_id
              WHERE d3.v NOT IN (SELECT v FROM sel2)
              ORDER BY score DESC, d3.v LIMIT 1),
       sel3 AS (SELECT v FROM sel2 UNION ALL SELECT v FROM s3),
       d4 AS (SELECT va v, MAX(m) ms FROM mat WHERE vb IN (SELECT v FROM sel3) GROUP BY 1),
       s4 AS (SELECT d4.v, 700*r - 300*ms score FROM d4 JOIN rel ON d4.v = rel.vec_id
              WHERE d4.v NOT IN (SELECT v FROM sel3)
              ORDER BY score DESC, d4.v LIMIT 1)
       SELECT CAST(1 AS BIGINT) sel_rank, v vec_id, CAST(score AS BIGINT) score FROM s1
       UNION ALL SELECT 2, v, CAST(score AS BIGINT) FROM s2
       UNION ALL SELECT 3, v, CAST(score AS BIGINT) FROM s3
       UNION ALL SELECT 4, v, CAST(score AS BIGINT) FROM s4
       ORDER BY sel_rank""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.mmrSelect(
        e.filter(col("vec_id") >= 1 && col("vec_id") < 300),
        e.filter(col("vec_id") === 0), k = 4, lambdaMillis = 700L)
      .orderBy("sel_rank")
  }

  // Greedy k-center coreset selection (round 15): seed = lowest id,
  // then 3 farthest-point picks (max min-dist, ties → lowest id) — the
  // diversity draw for eval-set curation (Gonzalez 1985 2-approx).
  // Distance = 1000 − round(cos·10³): ONE rounding, engine-exact. The
  // oracle unrolls the greedy rounds as chained argmax CTEs over the
  // pair matrix (self-pairs kept: their 0 distance is what makes a
  // selected point unpickable); the engine never forms the matrix —
  // k−1 broadcast-selected corpus scans.
  declare("sim_kcenter",
    """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
       x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i FROM e),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       mat AS (SELECT a.vec_id va, b.vec_id vb,
                 CAST(1000 - round(SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE))
                   /(na.nn*nb.nn)*1000, 0) AS BIGINT) d
               FROM x a JOIN x b ON a.i = b.i
               JOIN norms na ON a.vec_id = na.vec_id
               JOIN norms nb ON b.vec_id = nb.vec_id
               GROUP BY a.vec_id, b.vec_id, na.nn, nb.nn),
       s1 AS (SELECT MIN(vec_id) v FROM e),
       d2 AS (SELECT va v, MIN(d) d FROM mat JOIN s1 ON vb = s1.v GROUP BY 1),
       s2 AS (SELECT v, d FROM d2 ORDER BY d DESC, v LIMIT 1),
       d3 AS (SELECT va v, MIN(d) d FROM mat
              WHERE vb IN (SELECT v FROM s1 UNION ALL SELECT v FROM s2) GROUP BY 1),
       s3 AS (SELECT v, d FROM d3 ORDER BY d DESC, v LIMIT 1),
       d4 AS (SELECT va v, MIN(d) d FROM mat
              WHERE vb IN (SELECT v FROM s1 UNION ALL SELECT v FROM s2
                           UNION ALL SELECT v FROM s3) GROUP BY 1),
       s4 AS (SELECT v, d FROM d4 ORDER BY d DESC, v LIMIT 1)
       SELECT CAST(1 AS BIGINT) sel_rank, v vec_id, CAST(0 AS BIGINT) dist_milli FROM s1
       UNION ALL SELECT 2, v, d FROM s2
       UNION ALL SELECT 3, v, d FROM s3
       UNION ALL SELECT 4, v, d FROM s4
       ORDER BY sel_rank""") { (spark, sfDir) =>
    Similarity.kCenterSelect(
        t(spark, sfDir, "embeddings").filter(col("vec_id") < 300), k = 4)
      .orderBy("sel_rank")
  }

  // kNN-graph construction (round 15): IVF top-k with a CORPUS-SIZED
  // query side — the neighbor graph agglomerative dedup / clustering
  // consumes. Same probe semantics as sim_topk_ivf; the probe table
  // joins the bucketed corpus by cell co-partitioned (no broadcast
  // hint — fatal at graph scale). Queries capped at vec_id < 500 to
  // bound the relational oracle; the operator takes the whole corpus.
  declare("sim_knn_graph",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       vc AS (SELECT a.vec_id, c.vec_id cid,
                round(SUM(CAST(a.v AS DOUBLE)*CAST(c.v AS DOUBLE))/(na.nn*nc2.nn), 6) csim
              FROM x a JOIN x c ON a.i = c.i AND c.vec_id < 16
              JOIN norms na ON a.vec_id = na.vec_id
              JOIN norms nc2 ON c.vec_id = nc2.vec_id
              GROUP BY a.vec_id, c.vec_id, na.nn, nc2.nn),
       asg AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
                 FROM vc) WHERE rn = 1),
       probes AS (SELECT vec_id query_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) rn
                 FROM vc WHERE vec_id < 500) WHERE rn <= 4),
       cands AS (SELECT DISTINCT p.query_id, a.vec_id neighbor_id
                 FROM probes p JOIN asg a ON p.cid = a.cid
                 WHERE a.vec_id != p.query_id),
       dots AS (SELECT cd.query_id, cd.neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM cands cd
                JOIN x q ON q.vec_id = cd.query_id
                JOIN x c ON c.vec_id = cd.neighbor_id AND c.i = q.i
                GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 5
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.knnGraph(e, e.filter(col("vec_id") < 16), k = 5, nProbe = 4,
        queries = Some(e.filter(col("vec_id") < 500)))
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }


  // Graph-walk ANN (round 20, verdict-19 stretch #8): greedy beam
  // search over a materialized k-NN graph — the third ANN family next
  // to IVF and PQ (Similarity.graphWalkTopK: entry points = the 4
  // lowest vec_ids, beam 16, 3 expansion rounds, quantized cosine with
  // id tie-breaks). The oracle replicates the ENTIRE walk relationally
  // (graph construction, per-round expand/score/cut, final top-k), so
  // every beam decision is cross-engine-verified. Corpus bounded at
  // vec_id < 300 for the all-pairs oracle; the operator itself takes
  // any corpus + any neighbor graph (sim_knn_graph's IVF graph at
  // scale).
  declare("sim_ann_graph_walk",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings WHERE vec_id < 300),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT a.vec_id va, b.vec_id vb, SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)) dp
                FROM x a JOIN x b ON a.i = b.i AND a.vec_id != b.vec_id GROUP BY 1, 2),
       sims AS (SELECT va, vb, round(dp/(na.nn*nb.nn), 3) sim
                FROM dots JOIN norms na ON va = na.vec_id JOIN norms nb ON vb = nb.vec_id),
       graph AS (SELECT va src, vb dst FROM (
                   SELECT va, vb, row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) rn
                   FROM sims) WHERE rn <= 5),
       entries AS (SELECT vec_id FROM embeddings WHERE vec_id < 300 ORDER BY vec_id LIMIT 4),
       b0 AS (SELECT qid, nid, sim FROM (
                SELECT va qid, vb nid, sim,
                  row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) rn
                FROM sims WHERE va < 8 AND vb IN (SELECT vec_id FROM entries)) WHERE rn <= 16),
       e1 AS (SELECT DISTINCT b.qid, g.dst nid FROM b0 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u1 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e1 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b0)),
       b1 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u1) WHERE rn <= 16),
       e2 AS (SELECT DISTINCT b.qid, g.dst nid FROM b1 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u2 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e2 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b1)),
       b2 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u2) WHERE rn <= 16)
       , e3 AS (SELECT DISTINCT b.qid, g.dst nid FROM b2 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u3 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e3 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b2)),
       b3 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u3) WHERE rn <= 16)
       SELECT qid query_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) rnk,
         nid neighbor_id, sim
       FROM b3
       QUALIFY rnk <= 5
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val sub = e.filter(col("vec_id") < 300)
    val graph = Similarity.bruteForceTopK(sub, sub, k = 5)
    Similarity.graphWalkTopK(sub, graph, sub.filter(col("vec_id") < 8),
        k = 5, beam = 16, rounds = 3, entries = 4)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  // The graph family's recall point for the ANN grid: recall@5 of the
  // walk against the exact top-5 over the same corpus (375 milli at
  // beam 16 / 3 rounds on the synthetic embeddings — random vectors
  // have no navigable manifold, exactly the degradation the grid is
  // for; IVF at full probes sits at 1000).
  declare("sim_ann_graph_recall",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings WHERE vec_id < 300),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT a.vec_id va, b.vec_id vb, SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)) dp
                FROM x a JOIN x b ON a.i = b.i AND a.vec_id != b.vec_id GROUP BY 1, 2),
       sims AS (SELECT va, vb, round(dp/(na.nn*nb.nn), 3) sim
                FROM dots JOIN norms na ON va = na.vec_id JOIN norms nb ON vb = nb.vec_id),
       graph AS (SELECT va src, vb dst FROM (
                   SELECT va, vb, row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) rn
                   FROM sims) WHERE rn <= 5),
       entries AS (SELECT vec_id FROM embeddings WHERE vec_id < 300 ORDER BY vec_id LIMIT 4),
       b0 AS (SELECT qid, nid, sim FROM (
                SELECT va qid, vb nid, sim,
                  row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) rn
                FROM sims WHERE va < 8 AND vb IN (SELECT vec_id FROM entries)) WHERE rn <= 16),
       e1 AS (SELECT DISTINCT b.qid, g.dst nid FROM b0 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u1 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e1 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b0)),
       b1 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u1) WHERE rn <= 16),
       e2 AS (SELECT DISTINCT b.qid, g.dst nid FROM b1 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u2 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e2 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b1)),
       b2 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u2) WHERE rn <= 16)
       , e3 AS (SELECT DISTINCT b.qid, g.dst nid FROM b2 b JOIN graph g ON b.nid = g.src
              WHERE g.dst != b.qid),
       u3 AS (SELECT DISTINCT qid, nid, sim FROM (
                SELECT e.qid, e.nid, s.sim FROM e3 e JOIN sims s ON s.va = e.qid AND s.vb = e.nid
                UNION ALL SELECT qid, nid, sim FROM b2)),
       b3 AS (SELECT qid, nid, sim FROM (
                SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
                FROM u3) WHERE rn <= 16),
       walk AS (SELECT qid, nid FROM (
         SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
         FROM b3) WHERE rn <= 5),
       exact AS (SELECT va qid, vb nid FROM (
         SELECT va, vb, row_number() OVER (PARTITION BY va ORDER BY sim DESC, vb) rn
         FROM sims WHERE va < 8) WHERE rn <= 5)
       SELECT 'graph' AS family,
         CAST((count(*) * 1000) // 40 AS BIGINT) AS recall_milli
       FROM walk w JOIN exact e ON w.qid = e.qid AND w.nid = e.nid""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val sub = e.filter(col("vec_id") < 300)
    val graph = Similarity.bruteForceTopK(sub, sub, k = 5)
    val wq = sub.filter(col("vec_id") < 8)
    val walk = Similarity.graphWalkTopK(sub, graph, wq,
      k = 5, beam = 16, rounds = 3, entries = 4)
    val exact = Similarity.bruteForceTopK(sub, wq, k = 5)
    walk.join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .agg((count(lit(1)) * 1000 / 40).cast("long").as("recall_milli"))
      .select(lit("graph").as("family"), col("recall_milli"))
  }

  // Positive-pair mining (round 15) — the other side of the contrastive
  // batch: per anchor, top-k most-similar SAME-label vectors (self
  // excluded); with sim_hard_negatives this completes the triplet. Same
  // scale shape (broadcast anchors, one row-local cosine scan, bounded
  // heaps); the oracle flips the label predicate to equality.
  declare("sim_positive_pairs",
    """WITH x AS (SELECT vec_id, label, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
                  SUM(CAST(q.v AS DOUBLE)*CAST(c.v AS DOUBLE)) dp
                FROM x q JOIN x c ON q.i = c.i AND q.vec_id != c.vec_id
                                  AND q.label = c.label
                WHERE q.vec_id < 5 GROUP BY 1, 2),
       scored AS (SELECT query_id, neighbor_id, round(dp/(nq.nn*nc.nn), 3) sim
                  FROM dots JOIN norms nq ON query_id = nq.vec_id
                            JOIN norms nc ON neighbor_id = nc.vec_id),
       ranked AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY sim DESC, neighbor_id) AS BIGINT) rnk,
                    neighbor_id, sim FROM scored)
       SELECT query_id, rnk, neighbor_id, sim FROM ranked WHERE rnk <= 10
       ORDER BY query_id, rnk""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.positivePairs(e, e.filter(col("vec_id") < 5), k = 10)
      .withColumnRenamed("rank", "rnk")
      .orderBy("query_id", "rnk")
  }

  // ------------------------------------------------------ text analysis
  declare("text_quality",
    """WITH q AS (SELECT doc_id, string_split(text, ' ') ws, length(text) nc
                  FROM documents WHERE doc_id < 100)
       SELECT doc_id,
         CAST(len(ws) AS BIGINT) n_tokens,
         CAST(len(list_distinct(ws)) AS BIGINT) n_uniq,
         CAST(floor(len(list_distinct(ws))*1000.0/len(ws)) AS BIGINT) ttr_millis,
         CAST(floor(len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is'], w)))*100.0/len(ws)) AS BIGINT) stopword_pct,
         CAST(floor((nc - (len(ws)-1))*100.0/len(ws)) AS BIGINT) tok_len_centi,
         len(ws) < 20 AS is_short
       FROM q ORDER BY doc_id""") { (spark, sfDir) =>
    TextAnalysis.quality(t(spark, sfDir, "documents").filter(col("doc_id") < 100))
      .orderBy("doc_id")
  }

  // Cross-source 5-gram overlap matrix (round 15): the dataset-
  // contamination diagnostic — distinct shared word n-grams and
  // shingle-set Jaccard (per-mille, exact integer counts) for every
  // source pair that shares anything.
  declare("dedup_cross_source",
    """WITH toks AS (SELECT source, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT source, list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) shingles
               FROM toks),
       sh AS (SELECT DISTINCT source, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT source, COUNT(*) n_sh FROM sh GROUP BY 1),
       inter AS (SELECT a.source src_a, b.source src_b, COUNT(*) n_shared
                 FROM sh a JOIN sh b USING (shingle)
                 WHERE a.source < b.source GROUP BY 1, 2)
       SELECT src_a, src_b, CAST(n_shared AS BIGINT) n_shared,
         CAST(floor(1000.0 * n_shared / (sa.n_sh + sb.n_sh - n_shared)) AS BIGINT) jaccard_millis
       FROM inter JOIN sizes sa ON sa.source = src_a
                  JOIN sizes sb ON sb.source = src_b
       ORDER BY src_a, src_b""") { (spark, sfDir) =>
    Dedup.crossSourceOverlap(t(spark, sfDir, "documents"))
      .orderBy("src_a", "src_b")
  }

  // Per-document duplication ratio (round 15): for each document, its
  // distinct 5-gram count, how many of those appear in ≥1 other
  // document, and the per-mille ratio — the corpus-health number the
  // crawl pipelines report before dedup.
  declare("dedup_shingle_ratio",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) shingles
               FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       shared AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) >= 2),
       j AS (SELECT sh.doc_id, CASE WHEN s.shingle IS NULL THEN 0 ELSE 1 END d
             FROM sh LEFT JOIN shared s ON sh.shingle = s.shingle)
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_sh, CAST(SUM(d) AS BIGINT) n_dup,
         CAST(floor(1000.0 * SUM(d) / COUNT(*)) AS BIGINT) dup_millis
       FROM j GROUP BY doc_id ORDER BY doc_id""") { (spark, sfDir) =>
    Dedup.shingleDupRatio(t(spark, sfDir, "documents")).orderBy("doc_id")
  }

  // Deterministic weighted sampling (round 15): keep-with-probability-w
  // as a pure function of md5(doc_id), weight = a length-based quality
  // proxy — survivors stable under reruns and corpus growth, zero
  // shuffle. The oracle computes the identical u < w·2³² predicate.
  declare("sample_weighted",
    """SELECT doc_id, CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
       FROM documents
       WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
             < least(1.0, greatest(0.0, length(coalesce(text, '')) / 2000.0)) * 4294967296.0
       ORDER BY doc_id""") { (spark, sfDir) =>
    TextAnalysis.sampleByWeight(t(spark, sfDir, "documents"),
        length(coalesce(col("text"), lit(""))) / lit(2000.0))
      .select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  // Dedup-threshold calibration curve (round 15; hardened round 16): the
  // pair-count histogram across Jaccard deciles ≥ 0.5 — the diagnostic a
  // pipeline reads BEFORE committing to a dedup threshold (where does the
  // pair mass sit; how much more would 0.7 remove than 0.8). Same
  // inverted-index candidate pass the dedup itself runs — the curve
  // costs one verify, not one run per candidate threshold.
  //
  // Round 16: declares the CAPPED candidate pass — the plan that actually
  // ships at 100 TB (the uncapped self-join is df² under a corpus-wide
  // hot shingle). The cap is pure arithmetic (df > greatest(64,
  // n_docs//1000), Dedup.resolveShingleCap) applied to the full inverted
  // index BEFORE the lossless PPJoin prefix filter, so the oracle
  // replicates the exact candidate set relationally: df-filter the
  // shingle CTE, sort+slice each doc's remaining shingles to the
  // t=0.5 prefix, self-join prefixes, then verify exact Jaccard over the
  // FULL shingle sets (the cap affects candidates only, never values).
  //
  // Round 17: the histogram gets a CURVE — near-copies planted at three
  // truncation depths (keep the first ceil(n·0.95 / 0.75 / 0.55) tokens
  // of every ≥60-token doc under doc_id 120), so pair mass lands in
  // deciles ≈9 / ≈7 / ≈5 at every SF (a prefix copy's Jaccard is
  // (keep−2)/(n−2)) — plus the cross-depth pairs and natural dup mass.
  // The factors are CAST AS DOUBLE in both texts: bare 0.95 is DECIMAL
  // in DuckDB and ceil at an exact-integer boundary could differ from
  // the double product Spark computes.
  declare("dedup_threshold_curve",
    """WITH seed AS (SELECT doc_id, string_split(text, ' ') ws FROM documents
                     WHERE doc_id < 120 AND len(string_split(text, ' ')) >= 60),
       p1 AS (SELECT doc_id + 50000 AS doc_id,
                array_to_string(list_slice(ws, 1,
                  CAST(ceil(len(ws) * CAST(0.95 AS DOUBLE)) AS INT)), ' ') AS text FROM seed),
       p2 AS (SELECT doc_id + 60000 AS doc_id,
                array_to_string(list_slice(ws, 1,
                  CAST(ceil(len(ws) * CAST(0.75 AS DOUBLE)) AS INT)), ' ') AS text FROM seed),
       p3 AS (SELECT doc_id + 70000 AS doc_id,
                array_to_string(list_slice(ws, 1,
                  CAST(ceil(len(ws) * CAST(0.55 AS DOUBLE)) AS INT)), ' ') AS text FROM seed),
       corpus AS (SELECT doc_id, text FROM documents
                  UNION ALL SELECT * FROM p1
                  UNION ALL SELECT * FROM p2
                  UNION ALL SELECT * FROM p3),
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM corpus),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       cap AS (SELECT greatest(64, COUNT(*) // 1000) c FROM corpus),
       hot AS (SELECT shingle FROM sh GROUP BY 1
               HAVING COUNT(*) > (SELECT c FROM cap)),
       cool AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
       pref AS (SELECT doc_id,
                  unnest(list_slice(shs, 1,
                    CAST(len(shs) - ceil(len(shs) * CAST(0.5 AS DOUBLE)) + 1 AS INT))) AS shingle
                FROM (SELECT doc_id, list_sort(list(shingle)) shs FROM cool GROUP BY 1)),
       cand AS (SELECT DISTINCT x.doc_id a, y.doc_id b
                FROM pref x JOIN pref y ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT c.a, c.b, COUNT(*) i
                 FROM cand c JOIN sh x ON x.doc_id = c.a
                      JOIN sh y ON y.doc_id = c.b AND x.shingle = y.shingle
                 GROUP BY 1, 2),
       jac AS (SELECT a, b, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) j FROM inter
               JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id)
       SELECT CAST(floor(j * 10) AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) n_pairs
       FROM jac WHERE j >= 0.5 GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents").select("doc_id", "text")
    val seed = d.filter(col("doc_id") < 120)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 60)
    def plantAt(off: Int, f: Double) = seed.select(
      (col("doc_id") + off).as("doc_id"),
      concat_ws(" ", slice(col("ws"), lit(1),
        ceil(size(col("ws")) * lit(f)).cast("int"))).as("text"))
    val corpus = d.union(plantAt(50000, 0.95))
      .union(plantAt(60000, 0.75)).union(plantAt(70000, 0.55))
    Dedup.jaccardPairs(corpus, threshold = 0.5,
        maxShingleDf = Dedup.AutoShingleDf)
      .select(floor(col("jaccard") * 10).cast("long").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("n_pairs"))
      .orderBy("decile")
  }

  // Per-source retention cap (round 15): "keep the best 5 documents per
  // domain" — the anti-domination policy big crawl corpora apply before
  // mixing. Best = (n_chars DESC, doc_id ASC). The engine side is the
  // two-phase bounded-heap top-N (no corpus-wide window partitioned by a
  // possibly-hot domain); the oracle is the naive global window the
  // two-phase plan must equal exactly.
  declare("sample_domain_cap",
    """WITH ranked AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) rn
         FROM documents)
       SELECT doc_id, source, CAST(rn AS BIGINT) rn FROM ranked
       WHERE rn <= 5 ORDER BY source, rn""") { (spark, sfDir) =>
    TextAnalysis.capPerGroup(t(spark, sfDir, "documents"), "source", 5, "n_chars")
      .select(col("doc_id"), col("grp").as("source"), col("rn"))
      .orderBy("source", "rn")
  }

  // Embedding-space decontamination (round 15): corpus vectors whose max
  // round-3 cosine against the label-0 eval set reaches 0.35 are flagged
  // — the semantic train/test leak lexical n-gram decontamination cannot
  // see (paraphrased eval copies). Output: per-label totals. The engine
  // broadcasts the eval set and scans the corpus once (row-local
  // codegen'd dot products, map-side max — no corpus shuffle); the
  // oracle recomputes every pair relationally.
  declare("decon_embedding",
    """WITH x AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) v,
                    generate_subscripts(embedding, 1) i FROM embeddings),
       n AS (SELECT vec_id, sqrt(SUM(v*v)) nn FROM x GROUP BY 1),
       ev AS (SELECT * FROM x WHERE label = 0),
       co AS (SELECT * FROM x WHERE label <> 0),
       dots AS (SELECT co.vec_id a, ev.vec_id b, SUM(co.v * ev.v) dp
                FROM co JOIN ev ON co.i = ev.i GROUP BY 1, 2),
       mx AS (SELECT a AS vec_id, MAX(round(dp/(na.nn*nb.nn), 3)) ms
              FROM dots JOIN n na ON na.vec_id = a JOIN n nb ON nb.vec_id = b
              GROUP BY 1),
       lab AS (SELECT e.vec_id, e.label, m.ms
               FROM (SELECT vec_id, label FROM embeddings WHERE label <> 0) e
               JOIN mx m USING (vec_id))
       SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) n_total,
         CAST(SUM(CASE WHEN ms >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) n_flagged
       FROM lab GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    val corpus = e.filter(col("label") =!= 0)
    Similarity.decontaminateByEmbedding(corpus, e.filter(col("label") === 0),
        0.35, keepCols = Seq("label"))
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .orderBy("label")
  }

  // DSIR-style importance scoring (round 15; Xie et al. 2023, public
  // paper): per-document average log-likelihood ratio between the
  // target distribution (lang = 'en') and the raw corpus, add-one
  // smoothed over the top-50 vocabulary + one OOV bucket; top-20 docs
  // by micro-nat score. Counts stay exact integers, so the only
  // order-sensitive float sum is the per-doc term sum under the same
  // micro-nat flooring text_corpus_divergence ships with.
  declare("text_importance_llr",
    """WITH toks AS (SELECT doc_id, lang = 'en' AS is_t,
                       unnest(string_split(text, ' ')) tok FROM documents),
       cnt AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) rc,
                 CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS DOUBLE) tc
               FROM toks GROUP BY 1),
       vocab AS (SELECT tok, rc, tc FROM cnt ORDER BY rc DESC, tok LIMIT 50),
       tot AS (SELECT SUM(rc) r, SUM(tc) t FROM cnt),
       vs AS (SELECT SUM(rc) rv, SUM(tc) tv FROM vocab),
       terms AS (SELECT k.doc_id,
           CASE WHEN v.tok IS NOT NULL THEN ln((v.tc + 1) / (v.rc + 1))
                ELSE ln((tot.t - vs.tv + 1) / (tot.r - vs.rv + 1)) END
           + ln((tot.r + 51) / (tot.t + 51)) AS lr
         FROM toks k LEFT JOIN vocab v USING (tok) CROSS JOIN tot CROSS JOIN vs),
       perdoc AS (SELECT doc_id, COUNT(*) n_tokens, SUM(lr) s
                  FROM terms GROUP BY 1)
       SELECT doc_id, CAST(n_tokens AS BIGINT) n_tokens,
         CAST(floor(s / n_tokens * 1e6) AS BIGINT) llr_micro
       FROM perdoc ORDER BY llr_micro DESC, doc_id LIMIT 20""") { (spark, sfDir) =>
    TextAnalysis.importanceWeights(t(spark, sfDir, "documents"),
      col("lang") === "en")
  }

  // LM-perplexity quality filter (round 15, the CCNet recipe): score
  // every document under an interpolated bigram/unigram LM trained on
  // the corpus (top-50 vocab + single OOV bucket, add-one smoothing),
  // surface the 20 highest-perplexity documents — the filter's first
  // drops. Count tables are vocab-bounded (≤51 unigrams, ≤51² bigrams)
  // and broadcast; the corpus is scanned twice, shuffled once (the
  // per-doc combine). The oracle recomputes the identical model
  // relationally; the score is integer-floored micro-nats.
  declare("text_perplexity",
    """WITH base AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       cnt AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) c
               FROM (SELECT unnest(ws) tok FROM base) GROUP BY 1),
       vocab AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 50),
       tot AS (SELECT CAST(SUM(c) AS DOUBLE) n FROM cnt),
       vs AS (SELECT CAST(SUM(c) AS DOUBLE) vc FROM vocab),
       ucnt AS (SELECT tok, c FROM vocab
                UNION ALL SELECT ' ', tot.n - vs.vc FROM tot, vs),
       pairs0 AS (SELECT doc_id,
           list_transform(generate_series(1, greatest(len(ws)-1, 0)), i -> ws[i]) ps,
           list_transform(generate_series(1, greatest(len(ws)-1, 0)), i -> ws[i+1]) cs
         FROM base),
       pairs AS (SELECT doc_id, unnest(ps) prev, unnest(cs) cur FROM pairs0),
       bp AS (SELECT doc_id,
                CASE WHEN vp.tok IS NOT NULL THEN prev ELSE ' ' END pb,
                CASE WHEN vc2.tok IS NOT NULL THEN cur ELSE ' ' END cb
              FROM pairs LEFT JOIN vocab vp ON prev = vp.tok
                         LEFT JOIN vocab vc2 ON cur = vc2.tok),
       bcnt AS (SELECT pb, cb, CAST(COUNT(*) AS DOUBLE) bc FROM bp GROUP BY 1, 2),
       terms AS (SELECT doc_id,
           -ln(CAST(0.7 AS DOUBLE) * (b.bc + 1) / (up.c + 51)
               + CAST(0.3 AS DOUBLE) * (uc.c + 1) / (tot.n + 51)) t
         FROM bp JOIN bcnt b USING (pb, cb)
         JOIN ucnt up ON bp.pb = up.tok JOIN ucnt uc ON bp.cb = uc.tok
         CROSS JOIN tot),
       perdoc AS (SELECT doc_id, COUNT(*) n_bigrams, SUM(t) s FROM terms GROUP BY 1)
       SELECT doc_id, CAST(n_bigrams AS BIGINT) n_bigrams,
         CAST(floor(s / n_bigrams * 1e6) AS BIGINT) nll_micro
       FROM perdoc ORDER BY nll_micro DESC, doc_id LIMIT 20""") { (spark, sfDir) =>
    TextAnalysis.perplexityScores(t(spark, sfDir, "documents"))
  }

  // Wordlist filtering (round 15): the badword-list pass, per-source
  // rollup of occurrence counts and the >10%-of-tokens block verdict.
  // The blocklist is a BROADCAST table, not a literal IN-list —
  // production lists run 10⁴+ entries where per-token array scans and
  // giant codegen IN-lists both fall over; hit tokens are a vanishing
  // fraction of the corpus so the per-doc combine aggregates a small
  // exploded subset. Verdict is exact integer arithmetic.
  declare("text_blocklist",
    """WITH bl(tok) AS (VALUES ('slow'), ('dup'), ('big')),
       toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
       hits AS (SELECT doc_id, COUNT(*) h FROM toks JOIN bl USING (tok) GROUP BY 1),
       perdoc AS (SELECT d.source, len(string_split(d.text, ' ')) n_tokens,
                         COALESCE(h.h, 0) n_hits
                  FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
       SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
         CAST(SUM(CASE WHEN n_hits * 100 > n_tokens * 10 THEN 1 ELSE 0 END) AS BIGINT) n_blocked,
         CAST(SUM(n_hits) AS BIGINT) n_hits
       FROM perdoc GROUP BY source ORDER BY source""") { (spark, sfDir) =>
    TextAnalysis.blocklistFilter(t(spark, sfDir, "documents"),
        Seq("slow", "dup", "big"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
        sum("n_hits").as("n_hits"))
      .orderBy("source")
  }

  // Filtering-funnel report (round 15): the per-stage survivor/drop
  // accounting every curation pipeline publishes — min-length →
  // stopword-density → blocklist → exact-dedup, CUMULATIVE (each stage
  // sees only the previous stage's survivors; dedup elects min-doc_id
  // per content hash among stage-3 survivors). Composes the quality,
  // blocklist, and hash-dedup operators over ONE corpus scan per
  // operator family with doc_id-keyed joins; every verdict is exact
  // integer arithmetic so both engines agree bit-for-bit.
  declare("pipeline_funnel",
    """WITH bl(tok) AS (VALUES ('slow'), ('dup'), ('big')),
       base AS (SELECT doc_id, text, string_split(text, ' ') ws FROM documents),
       q AS (SELECT doc_id, text, len(ws) n_tokens,
               len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is'], w))) n_stop
             FROM base),
       hits AS (SELECT doc_id, COUNT(*) nh
                FROM (SELECT doc_id, unnest(ws) tok FROM base) JOIN bl USING (tok) GROUP BY 1),
       f AS (SELECT q.doc_id, q.text, q.n_tokens,
               q.n_tokens >= 20 AS k1,
               q.n_tokens >= 20 AND floor(q.n_stop*100.0/q.n_tokens) >= 5 AS k2,
               q.n_tokens >= 20 AND floor(q.n_stop*100.0/q.n_tokens) >= 5
                 AND NOT (COALESCE(h.nh, 0)*100 > q.n_tokens*10) AS k3
             FROM q LEFT JOIN hits h ON q.doc_id = h.doc_id),
       dmin AS (SELECT md5(text) h2, MIN(doc_id) keeper FROM f WHERE k3 GROUP BY 1),
       surv AS (SELECT f.*, (k3 AND f.doc_id = d.keeper) AS k4
                FROM f LEFT JOIN dmin d ON md5(f.text) = d.h2),
       counts AS (SELECT COUNT(*) s0,
         SUM(CASE WHEN k1 THEN 1 ELSE 0 END) s1, SUM(CASE WHEN k2 THEN 1 ELSE 0 END) s2,
         SUM(CASE WHEN k3 THEN 1 ELSE 0 END) s3, SUM(CASE WHEN k4 THEN 1 ELSE 0 END) s4 FROM surv)
       SELECT CAST(0 AS BIGINT) AS stage, 'all' AS label, CAST(s0 AS BIGINT) AS n_docs, CAST(0 AS BIGINT) AS n_dropped FROM counts
       UNION ALL SELECT 1, 'min_length', CAST(s1 AS BIGINT), CAST(s0 - s1 AS BIGINT) FROM counts
       UNION ALL SELECT 2, 'stopwords', CAST(s2 AS BIGINT), CAST(s1 - s2 AS BIGINT) FROM counts
       UNION ALL SELECT 3, 'blocklist', CAST(s3 AS BIGINT), CAST(s2 - s3 AS BIGINT) FROM counts
       UNION ALL SELECT 4, 'exact_dedup', CAST(s4 AS BIGINT), CAST(s3 - s4 AS BIGINT) FROM counts
       ORDER BY stage""") { (spark, sfDir) =>
    import spark.implicits._
    val docs0 = t(spark, sfDir, "documents")
    val q = TextAnalysis.quality(docs0)
      .select(col("doc_id"), col("n_tokens"), col("stopword_pct"))
    val b = TextAnalysis.blocklistFilter(docs0, Seq("slow", "dup", "big"))
      .select(col("doc_id"), col("blocked"))
    val f = docs0.select(col("doc_id"), md5(col("text")).as("h"))
      .join(q, "doc_id").join(b, "doc_id")
      .withColumn("k1", col("n_tokens") >= 20)
      .withColumn("k2", col("k1") && col("stopword_pct") >= 5)
      .withColumn("k3", col("k2") && !col("blocked"))
    val keeper = f.filter(col("k3")).groupBy("h").agg(min("doc_id").as("keeper"))
    val surv = f.join(keeper, Seq("h"), "left")
      .withColumn("k4", col("k3") && col("doc_id") === col("keeper"))
    val c = surv.agg(count(lit(1)).as("s0"),
      sum(when(col("k1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("k2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("k3"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("k4"), 1L).otherwise(0L)).as("s4"))
    val stages = Seq((0L, "all"), (1L, "min_length"), (2L, "stopwords"),
      (3L, "blocklist"), (4L, "exact_dedup")).toDF("stage", "label")
    stages.crossJoin(broadcast(c))
      .select(col("stage"), col("label"),
        when(col("stage") === 0, col("s0")).when(col("stage") === 1, col("s1"))
          .when(col("stage") === 2, col("s2")).when(col("stage") === 3, col("s3"))
          .otherwise(col("s4")).as("n_docs"),
        when(col("stage") === 0, lit(0L)).when(col("stage") === 1, col("s0") - col("s1"))
          .when(col("stage") === 2, col("s1") - col("s2"))
          .when(col("stage") === 3, col("s2") - col("s3"))
          .otherwise(col("s3") - col("s4")).as("n_dropped"))
      .orderBy("stage")
  }

  // Model-based quality filtering (round 15; oracled round 16): the
  // fastText-style quality classifier, split the way production splits
  // it. TRAINING — hashed-bag-of-words logistic regression under
  // distributed full-batch GD (treeAggregate gradients, MLlib's own
  // shape) — runs once, offline, and is deliberately ungated: float
  // gradient sums reorder across partitionings, so weights are ulp-
  // stable only per-layout; separation quality is spec-pinned in
  // PipelineSpec. The gate declares the SCORING pass under the model
  // that training PUBLISHED: the milli-quantized lexicon below is the
  // round-16 dim-512/iters-30/lr-10 model's weights for the corpus's
  // top-24 tokens + the target token, frozen as integer literals (the
  // deploy artifact). The keep decision `z_milli >= 0` ⟺ `p >= 0.5`
  // is exact integer arithmetic, so DuckDB recomputes it bit-for-bit.
  // Training target: "document contains 'the'" — a lexical property a
  // bag-of-words model can actually learn (the synthetic lang column is
  // metadata over one shared token pool, textually unlearnable); the
  // published model indeed puts w('the') = +24.621 against intercept
  // -7.667 with every other weight small — the output compares its keep
  // decision against the target per source.
  private val qualityInterceptMilli = -7667L
  private val qualityLexicon: Seq[(String, Long)] = Seq(
    "a" -> 1102L, "agg" -> 1350L, "batch" -> -1562L, "column" -> 301L,
    "customer" -> -2034L, "data" -> -883L, "filter" -> 390L,
    "group" -> -2491L, "hash" -> -307L, "join" -> -215L, "key" -> -1042L,
    "line" -> 1456L, "merge" -> 1888L, "order" -> -829L, "row" -> 66L,
    "scan" -> -1010L, "slow" -> -1082L, "small" -> -1378L,
    "spark" -> 1729L, "stream" -> -980L, "table" -> -1024L,
    "the" -> 24621L, "value" -> 568L, "vector" -> -1975L,
    "window" -> 1213L)

  declare("quality_classifier",
    s"""WITH d AS (SELECT source,
           string_split(coalesce(text, ''), ' ') AS ws FROM documents),
       z AS (SELECT source, list_contains(ws, 'the') AS target,
           $qualityInterceptMilli${qualityLexicon.map { case (tok, w) =>
             s" + (CASE WHEN list_contains(ws, '$tok') THEN $w ELSE 0 END)"
           }.mkString} AS zm
         FROM d)
       SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
         CAST(SUM(CASE WHEN target THEN 1 ELSE 0 END) AS BIGINT) n_target,
         CAST(SUM(CASE WHEN zm >= 0 THEN 1 ELSE 0 END) AS BIGINT) n_kept,
         CAST(SUM(CASE WHEN (zm >= 0) = target THEN 1 ELSE 0 END) AS BIGINT) n_agree
       FROM z GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val docs = t(spark, sfDir, "documents").withColumn("label",
      array_contains(split(coalesce(col("text"), lit("")), " "), "the"))
    QualityClassifier.scoreLexicon(docs, qualityLexicon, qualityInterceptMilli)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_target"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep") === col("label"), 1L).otherwise(0L))
          .as("n_agree"))
      .orderBy("source")
  }

  // Per-source vocabulary OOV rate under the global top-100 vocab
  // (round 15): the "is this vocab size enough for every source"
  // diagnostic a tokenizer build runs — per-source drill-down of the
  // divergence query's OOV bucket. Exact integer counts; one corpus
  // aggregation + K-row broadcast back onto the token stream.
  declare("tokens_vocab_coverage",
    """WITH toks AS (SELECT source AS grp, unnest(string_split(text, ' ')) tok
                     FROM documents),
       cnt AS (SELECT tok, COUNT(*) c FROM toks GROUP BY 1),
       vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 100),
       j AS (SELECT grp, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END oov
             FROM toks t LEFT JOIN vocab v USING (tok))
       SELECT grp, CAST(COUNT(*) AS BIGINT) n_tokens, CAST(SUM(oov) AS BIGINT) n_oov,
         CAST(floor(1000.0 * SUM(oov) / COUNT(*)) AS BIGINT) oov_permille
       FROM j GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    TextAnalysis.vocabCoverage(t(spark, sfDir, "documents")).orderBy("grp")
  }

  // Per-source unigram KL divergence vs the pooled corpus (round 15):
  // the mixture-drift diagnostic, over the global top-50 vocabulary
  // plus one explicit OOV bucket (bounded coverage, and ~51 float
  // terms per group keeps the summation-order error far below the
  // micro-nat flooring both engines agree on).
  declare("text_corpus_divergence",
    """WITH toks AS (SELECT source AS grp, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
       gt AS (SELECT grp, tok, CAST(COUNT(*) AS DOUBLE) c FROM toks GROUP BY 1, 2),
       tot AS (SELECT tok, SUM(c) ct FROM gt GROUP BY 1),
       vocab AS (SELECT tok, ct FROM tot ORDER BY ct DESC, tok LIMIT 50),
       ngt AS (SELECT grp, SUM(c) ng FROM gt GROUP BY 1),
       bign AS (SELECT SUM(ct) AS N FROM tot),
       vn AS (SELECT SUM(ct) AS vN FROM vocab),
       terms AS (
         SELECT g.grp, SUM(g.c / n.ng * ln(g.c * b.N / (n.ng * v.ct))) kl_v,
                SUM(g.c) cv
         FROM gt g JOIN vocab v USING (tok) JOIN ngt n USING (grp)
              CROSS JOIN bign b
         GROUP BY 1)
       SELECT t.grp AS grp, CAST(n.ng AS BIGINT) n_tokens,
         CAST(floor((t.kl_v + CASE WHEN n.ng > t.cv
             THEN (n.ng - t.cv) / n.ng *
                  ln((n.ng - t.cv) * b.N / (n.ng * (b.N - v.vN)))
             ELSE 0.0 END) * 1e6) AS BIGINT) kl_micro
       FROM terms t JOIN ngt n USING (grp) CROSS JOIN bign b CROSS JOIN vn v
       ORDER BY grp""") { (spark, sfDir) =>
    TextAnalysis.corpusDivergence(t(spark, sfDir, "documents"))
      .orderBy("grp")
  }

  // Gopher quality-filter rule set (Rae et al. 2021, appendix A1.1):
  // per-document boolean flags + combined keep verdict, every ratio
  // multiplied out to exact integer comparisons so the engines agree
  // bit-for-bit. Row-local codegen'd expressions — one narrow pass,
  // no shuffle, the 100 TB filter shape.
  declare("text_gopher_rules",
    """WITH q AS (SELECT doc_id, string_split(text, ' ') ws,
                         string_split(text, chr(10)) ls, text
                  FROM documents WHERE doc_id < 200),
       c AS (SELECT doc_id,
         CAST(len(ws) AS BIGINT) n_words,
         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) n_word_chars,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) n_alpha_words,
         CAST(len(list_filter(ws, w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS BIGINT) n_stop,
         CAST((length(text) - length(replace(text, '#', ''))) / 1
            + (length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) n_sym,
         CAST(len(ls) AS BIGINT) n_lines,
         CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) n_bullet,
         CAST(len(list_filter(ls, l -> ends_with(l, '...'))) AS BIGINT) n_ellipsis
         FROM q)
       SELECT doc_id, n_words, n_stop,
         n_words BETWEEN 50 AND 100000 AS f_word_count,
         n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10 AS f_mean_len,
         n_sym * 10 <= n_words AS f_symbol,
         n_bullet * 10 <= n_lines * 9 AS f_bullet,
         n_ellipsis * 10 <= n_lines * 3 AS f_ellipsis,
         n_alpha_words * 5 >= n_words * 4 AS f_alpha,
         n_stop >= 2 AS f_stop,
         (n_words BETWEEN 50 AND 100000)
           AND n_word_chars >= n_words * 3 AND n_word_chars <= n_words * 10
           AND n_sym * 10 <= n_words
           AND n_bullet * 10 <= n_lines * 9
           AND n_ellipsis * 10 <= n_lines * 3
           AND n_alpha_words * 5 >= n_words * 4
           AND n_stop >= 2 AS keep
       FROM c ORDER BY doc_id""") { (spark, sfDir) =>
    TextAnalysis.gopherRules(
      t(spark, sfDir, "documents").filter(col("doc_id") < 200))
      .orderBy("doc_id")
  }

  declare("text_stats_by_lang",
    """SELECT lang, source, COUNT(*) n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) sum_tokens,
         CAST(SUM(length(text)) AS BIGINT) sum_chars
       FROM documents GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    t(spark, sfDir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("sum_tokens"),
        sum(length(col("text"))).cast("long").as("sum_chars"))
      .orderBy("lang", "source")
  }

  declare("text_langid",
    """SELECT lang,
         CASE WHEN list_contains(string_split(text, ' '), 'the')
                OR list_contains(string_split(text, ' '), 'a')
              THEN 'en' ELSE 'unknown' END predicted,
         COUNT(*) n
       FROM documents GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    t(spark, sfDir, "documents")
      .groupBy(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  declare("text_fingerprint",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents WHERE doc_id < 100),
       sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) h FROM toks)
       SELECT doc_id, MIN(h) fingerprint, CAST(COUNT(DISTINCT h) AS BIGINT) n_shingles
       FROM sh GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    TextAnalysis.fingerprint(t(spark, sfDir, "documents").filter(col("doc_id") < 100))
      .orderBy("doc_id")
  }

  declare("text_token_regex",
    """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) n_lex
       FROM documents WHERE doc_id < 100 ORDER BY doc_id""") { (spark, sfDir) =>
    t(spark, sfDir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        size(TextAnalysis.regexTokens(col("text"))).cast("long").as("n_lex"))
      .orderBy("doc_id")
  }

  declare("text_chunk_windows",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') ws, len(string_split(text, ' ')) n
                  FROM documents WHERE doc_id < 20),
       c AS (SELECT doc_id, unnest(generate_series(1, greatest(n - 40, 0) + 1, 30)) AS start, ws, n
             FROM t)
       SELECT doc_id,
         CAST(floor((start - 1) / 30.0) AS BIGINT) AS chunk_idx,
         CAST(start AS BIGINT) AS start,
         CAST(least(40, n - start + 1) AS BIGINT) AS n_tok,
         ws[start] AS head_tok,
         ws[least(start + 39, n)] AS tail_tok
       FROM c ORDER BY doc_id, chunk_idx""") { (spark, sfDir) =>
    TextAnalysis.chunkWindows(
        t(spark, sfDir, "documents").filter(col("doc_id") < 20),
        window = 40, stride = 30)
      .orderBy("doc_id", "chunk_idx")
  }

  // ------------------------------------------- end-to-end data prep
  declare("pipeline_end_to_end",
    """WITH corpus AS (SELECT doc_id, text, lang FROM documents
         UNION ALL SELECT doc_id + 10000, text, lang FROM documents WHERE doc_id < 20),
       quality AS (
         SELECT doc_id, lang, text, len(string_split(text, ' ')) n_tokens
         FROM corpus
         WHERE len(string_split(text, ' ')) >= 20
           AND floor(len(list_filter(string_split(text, ' '),
                 w -> list_contains(['the','a','and','of','to','in','is'], w)))*100.0
               / len(string_split(text, ' '))) < 50
       ),
       keep AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
       deduped AS (SELECT * FROM quality WHERE doc_id IN (SELECT doc_id FROM keep))
       SELECT lang, COUNT(*) n_docs, CAST(SUM(n_tokens) AS BIGINT) sum_tokens
       FROM deduped GROUP BY lang ORDER BY lang""") { (spark, sfDir) =>
    // The full training-data prep chain in one plan: plant duplicates,
    // quality-filter, near-dup-dedup (exact threshold -> the planted
    // copies drop, originals survive), aggregate stats per language.
    val docs = t(spark, sfDir, "documents").select("doc_id", "text", "lang")
    val corpus = docs.union(docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"), col("lang")))
    val q = TextAnalysis.quality(corpus)
      .filter(col("n_tokens") >= 20 && col("stopword_pct") < 50)
      .select("doc_id")
    val filtered = corpus.join(q, Seq("doc_id"))
    Dedup.deduplicate(filtered, threshold = 1.0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("sum_tokens"))
      .orderBy("lang")
  }

  // -------------------------------------------------------- multimodal
  declare("multimodal_assets",
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END kind,
         COUNT(*) n,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) sum_bytes,
         CAST(SUM(CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT)) AS BIGINT) sum_chunks
       FROM documents GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    Multimodal.withMeta(Multimodal.syntheticAssets(t(spark, sfDir, "documents")))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("size_bytes").as("sum_bytes"),
        sum("n_chunks").as("sum_chunks"))
      .orderBy("kind")
  }

  declare("multimodal_decode",
    """WITH d AS (SELECT doc_id, text, length(text) len,
             CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp'
               WHEN 2 THEN 'y4m' WHEN 3 THEN 'png' ELSE 'gif' END fmt
           FROM documents WHERE doc_id < 60),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d),
       per AS (SELECT d.doc_id, d.fmt, d.len,
                 COALESCE(SUM(c.a), 0) suma,
                 COALESCE(SUM(abs(c.a - 128) * 128), 0) sumabs
               FROM d LEFT JOIN ch c USING (doc_id) GROUP BY 1, 2, 3),
       rows16 AS (SELECT doc_id, CASE WHEN len = 0 THEN 1
                    ELSE CAST(ceil(len / 16.0) AS BIGINT) END h16 FROM per),
       feat AS (SELECT fmt, per.doc_id,
                  CASE fmt WHEN 'wav' THEN 8000 WHEN 'y4m' THEN 8 ELSE 16 END w,
                  CASE fmt WHEN 'wav' THEN 1 WHEN 'y4m' THEN 8 ELSE h16 END h,
                  CASE fmt WHEN 'wav' THEN len
                    WHEN 'y4m' THEN CASE WHEN len = 0 THEN 1
                      ELSE CAST(ceil(len / 64.0) AS BIGINT) END
                    ELSE 16 * h16 END units,
                  CASE fmt WHEN 'wav' THEN sumabs ELSE suma END v
                FROM per JOIN rows16 USING (doc_id))
       SELECT fmt AS format, COUNT(*) n,
         CAST(SUM(w) AS BIGINT) sum_width, CAST(SUM(h) AS BIGINT) sum_height,
         CAST(SUM(units) AS BIGINT) sum_units, CAST(SUM(v) AS BIGINT) sum_value
       FROM feat GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // Generic magic-byte decode over a MIXED corpus of real containers —
    // one synthesizer per format, one decodeFeatures call dispatching each
    // payload to the right parser (RIFF walk, BMP header, Y4M header, PNG
    // zlib+unfilter, GIF LZW). The oracle recomputes every format's stats
    // from the text bytes each synthesizer encoded.
    val d = t(spark, sfDir, "documents").filter(col("doc_id") < 60)
    def m(r: Int) = d.filter(col("doc_id") % 5 === r)
    val assets =
      Multimodal.synthesizeWav(spark, m(0)).toDF("asset_id", "bytes")
        .union(Multimodal.synthesizeBmp(spark, m(1)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizeY4m(spark, m(2)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizePng(spark, m(3)).toDF("asset_id", "bytes"))
        .union(Multimodal.synthesizeGif(spark, m(4)).toDF("asset_id", "bytes"))
    Multimodal.decodeFeatures(spark, assets)
      .toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum("width").as("sum_width"),
        sum("height").as("sum_height"), sum("units").as("sum_units"),
        sum("value_sum").as("sum_value"))
      .orderBy("format")
  }

  declare("multimodal_gif",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d)
       SELECT doc_id AS asset_id, CAST(16 AS BIGINT) AS width,
         CAST(CASE WHEN length(min(d2.text)) = 0 THEN 1
           ELSE CAST(ceil(length(min(d2.text)) / 16.0) AS BIGINT) END AS BIGINT) AS height,
         CAST(SUM(a) AS BIGINT) AS pixel_sum,
         CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
       FROM ch JOIN d d2 USING (doc_id)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // REAL LZW round-trip: genuine GIF89a files (grayscale palette,
    // variable-width 9→12-bit LZW with CLEAR resets) synthesized and
    // parsed back through the full decompressor. Oracle recomputes pixel
    // stats from the text bytes (palette i = (i,i,i); zero padding adds
    // nothing to either stat).
    Multimodal.decodeGif(spark, Multimodal.synthesizeGif(spark,
        t(spark, sfDir, "documents").filter(col("doc_id") < 40), width = 16))
      .toDF().orderBy("asset_id")
  }

  declare("multimodal_frames",
    """WITH d AS (SELECT doc_id, text, length(text) n FROM documents WHERE doc_id < 30),
       f AS (SELECT doc_id,
               unnest(generate_series(0, CAST(ceil(n/64.0) AS BIGINT) - 1, 2)) AS fi, text, n
             FROM d),
       fr AS (SELECT doc_id, COUNT(*) AS n_frames,
                CAST(SUM(ascii(substr(text, CAST(fi*64+1 AS BIGINT), 1))) AS BIGINT) AS sum_first
              FROM f GROUP BY 1),
       r AS (SELECT doc_id,
               unnest(generate_series(0, CAST(ceil(n/7.0) AS BIGINT) - 1)) AS ri, text, n
             FROM d),
       rz AS (SELECT doc_id, COUNT(*) AS resized_bytes,
                CAST(SUM(ascii(substr(text, CAST(ri*7+1 AS BIGINT), 1))) AS BIGINT) AS byte_sum
              FROM r GROUP BY 1)
       SELECT fr.doc_id AS asset_id, fr.n_frames, fr.sum_first, rz.resized_bytes, rz.byte_sum
       FROM fr JOIN rz ON fr.doc_id = rz.doc_id
       ORDER BY asset_id""") { (spark, sfDir) =>
    // Frame-sample + resize over the synthetic (ASCII) payloads; the
    // oracle recomputes both from character offsets, which equal byte
    // offsets for this corpus.
    val assets = Multimodal.syntheticAssets(
      t(spark, sfDir, "documents").filter(col("doc_id") < 30))
    val frames = Multimodal.sampleFrames(spark, assets, frameBytes = 64, everyN = 2)
      .toDF()
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"), sum("first_byte").as("sum_first"))
    val resized = Multimodal.resizeDecimate(spark, assets, k = 7)
      .toDF().select("asset_id", "resized_bytes", "byte_sum")
    frames.join(resized, "asset_id").orderBy("asset_id")
  }

  declare("multimodal_wav",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d)
       SELECT doc_id AS asset_id, CAST(8000 AS BIGINT) AS sample_rate,
         CAST(1 AS BIGINT) AS n_channels, COUNT(*) AS n_samples,
         CAST(MAX(abs(a - 128) * 128) AS BIGINT) AS peak_abs,
         CAST(SUM(abs(a - 128) * 128) AS BIGINT) AS sum_abs
       FROM ch GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // A REAL binary decode path: synthesize genuine RIFF/WAVE containers,
    // then parse them back (magic check, chunk walk, fmt fields, LE int16
    // PCM reduce). The oracle recomputes the features from the text bytes
    // the synth encoded.
    val wavs = Multimodal.synthesizeWav(spark,
      t(spark, sfDir, "documents").filter(col("doc_id") < 40))
    Multimodal.decodeWav(spark, wavs).toDF().orderBy("asset_id")
  }

  declare("multimodal_bmp",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d)
       SELECT doc_id AS asset_id, CAST(16 AS BIGINT) AS width,
         CAST(CASE WHEN length(min(d2.text)) = 0 THEN 1
           ELSE CAST(ceil(length(min(d2.text)) / 16.0) AS BIGINT) END AS BIGINT) AS height,
         CAST(SUM(a) AS BIGINT) AS pixel_sum,
         CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
       FROM ch JOIN d d2 USING (doc_id)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // REAL image container round-trip: genuine 24-bpp BMPs parsed back
    // (magic, pixel offset, header dims, bottom-up padded rows). Oracle
    // recomputes pixel stats from the text bytes (zero padding adds 0 to
    // the sum and nothing to the nonzero count; the corpus has no NUL
    // characters).
    Multimodal.decodeBmp(spark, Multimodal.synthesizeBmp(spark,
        t(spark, sfDir, "documents").filter(col("doc_id") < 40), width = 16))
      .toDF().orderBy("asset_id")
  }

  // Perceptual image near-dup (round 15): aHash-64 through the REAL BMP
  // decoder (8×8 blue-channel grid vs integer mean, bottom-up padded
  // rows), pigeonhole 8-byte-chunk banding (EXACT for hamming ≤ 6 — at
  // most 6 differing bits touch ≤ 6 of 8 chunks), codegen'd
  // xor+bit_count verify. The plant: docs 30000+i are first-byte
  // perturbations of doc i — the tiny-edit near-identical image. The
  // oracle recomputes the hash arithmetic from the text bytes the synth
  // encoded and compares ALL pairs.
  declare("multimodal_image_neardup",
    """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
       d1 AS (SELECT doc_id + 30000 AS doc_id, 'Z' || substr(text, 2) AS text
              FROM d0 WHERE doc_id < 20),
       d AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1),
       dims AS (SELECT doc_id, text,
                  greatest(1, CAST(ceil(length(text) / 16.0) AS BIGINT)) hh FROM d),
       grid AS (SELECT doc_id, text, hh, i.g i, j.g j
                FROM dims, generate_series(0, 7) i(g), generate_series(0, 7) j(g)),
       samp AS (SELECT doc_id, i * 8 + j k,
                  ((i * hh) // 8) * 16 + (j * 16) // 8 + 1 AS idx, text
                FROM grid),
       vals AS (SELECT doc_id, k,
                  CASE WHEN idx <= length(text) THEN ascii(substr(text, idx, 1))
                       ELSE 0 END v
                FROM samp),
       means AS (SELECT doc_id, SUM(v) // 64 mean FROM vals GROUP BY 1),
       hashes AS (SELECT v.doc_id,
                    SUM(CASE WHEN v > mean AND k < 32
                             THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) h_hi,
                    SUM(CASE WHEN v > mean AND k >= 32
                             THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) h_lo
                  FROM vals v JOIN means m ON v.doc_id = m.doc_id GROUP BY 1),
       pairs AS (SELECT x.doc_id a, y.doc_id b,
                   bit_count(xor(x.h_hi, y.h_hi)) + bit_count(xor(x.h_lo, y.h_lo)) hamming
                 FROM hashes x JOIN hashes y ON x.doc_id < y.doc_id)
       SELECT a, b, CAST(hamming AS BIGINT) hamming FROM pairs
       WHERE hamming <= 6 ORDER BY a, b""") { (spark, sfDir) =>
    val base = t(spark, sfDir, "documents").filter(col("doc_id") < 200)
      .select("doc_id", "text")
    val pert = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(lit("Z"), expr("substr(text, 2)")).as("text"))
    Multimodal.imageNearDupPairs(spark,
        Multimodal.synthesizeBmp(spark, base.union(pert), width = 16),
        maxDist = 6)
      .orderBy("a", "b")
  }

  declare("multimodal_png",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d)
       SELECT doc_id AS asset_id, CAST(16 AS BIGINT) AS width,
         CAST(CASE WHEN length(min(d2.text)) = 0 THEN 1
           ELSE CAST(ceil(length(min(d2.text)) / 16.0) AS BIGINT) END AS BIGINT) AS height,
         CAST(SUM(a) AS BIGINT) AS pixel_sum,
         CAST(SUM(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
       FROM ch JOIN d d2 USING (doc_id)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // REAL COMPRESSED-container round-trip: genuine grayscale PNGs (IHDR/
    // IDAT/IEND, zlib DEFLATE via java.util.zip, per-chunk CRC32s) parsed
    // back through chunk-walk + CRC verify + Inflater + scanline
    // un-filtering. Oracle recomputes pixel stats from the text bytes the
    // synthesizer encoded (zero padding adds nothing to either stat).
    Multimodal.decodePng(spark, Multimodal.synthesizePng(spark,
        t(spark, sfDir, "documents").filter(col("doc_id") < 40), width = 16))
      .toDF().orderBy("asset_id")
  }

  declare("multimodal_y4m",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       ch AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                i -> ascii(substr(text, i, 1)))) a FROM d)
       SELECT doc_id AS asset_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
         CAST(CASE WHEN length(min(d2.text)) = 0 THEN 1
           ELSE CAST(ceil(length(min(d2.text)) / 64.0) AS BIGINT) END AS BIGINT) AS n_frames,
         CAST(SUM(a) AS BIGINT) AS luma_sum
       FROM ch JOIN d d2 USING (doc_id)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // REAL video container round-trip: YUV4MPEG2 streams (text header +
    // FRAME-marked C420 planes) synthesized and parsed back; oracle
    // recomputes frame counts and luma sums from the encoded bytes.
    Multimodal.decodeY4m(spark, Multimodal.synthesizeY4m(spark,
        t(spark, sfDir, "documents").filter(col("doc_id") < 40), 8, 8))
      .toDF().orderBy("asset_id")
  }

  declare("sim_cosine_sql",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       norms AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn FROM x GROUP BY 1),
       dots AS (SELECT b.vec_id, SUM(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)) dp
                FROM x a JOIN x b ON a.i = b.i AND a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 10
                GROUP BY 1)
       SELECT d.vec_id, round(dp/(na.nn*nb.nn), 3) AS sim
       FROM dots d JOIN norms na ON na.vec_id = 0 JOIN norms nb ON nb.vec_id = d.vec_id
       ORDER BY d.vec_id""") { (spark, sfDir) =>
    // The custom codegen'd Catalyst expression, exercised through its SQL
    // registration (GraftSparkExtensions injectFunction).
    Engine.registerViews(spark, sfDir)
    spark.sql(
      """SELECT b.vec_id, round(vector_cosine(a.embedding, b.embedding), 3) AS sim
         FROM embeddings a JOIN embeddings b
           ON a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 10
         ORDER BY b.vec_id""")
  }

  // -------------------------------------------------------- embeddings
  declare("sim_quantize_int8",
    """WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v FROM embeddings),
       mm AS (SELECT vec_id, MIN(v) mn, MAX(v) mx, COUNT(*) n FROM x GROUP BY 1)
       SELECT m.vec_id, m.mn AS qmin, m.mx AS qmax, m.n AS n_codes,
         CAST(SUM(CASE WHEN m.mx > m.mn
           THEN CAST(round((x.v - m.mn) * 255.0 / (m.mx - m.mn), 0) AS BIGINT)
           ELSE 0 END) AS BIGINT) AS code_sum
       FROM x JOIN mm m USING (vec_id)
       GROUP BY 1, 2, 3, 4 ORDER BY m.vec_id""") { (spark, sfDir) =>
    Similarity.quantizeInt8(t(spark, sfDir, "embeddings")).orderBy("vec_id")
  }

  // Product quantization — the other standard embedding-compression
  // ladder (m codeword ids per vector instead of dim floats; the
  // search-time scan shrinks dim*4/m-fold). Codebook = the 64 lowest
  // vec_ids' vectors (k-medoids-style sampling, so the oracle can
  // recompute it relationally); dim 64 / m=4 -> 16-dim subspaces.
  // Distances are round6-quantized before the argmin on BOTH engines
  // (the bestCentroid contract), ties to the smaller codeword id;
  // output flattened to (vec_id, s, code) rows of exact integers.
  declare("sim_quantize_pq",
    """WITH x AS (SELECT vec_id, unnest(embedding) v, generate_subscripts(embedding, 1) i
                  FROM embeddings),
       sub AS (SELECT vec_id, CAST(floor((i-1)/16) AS BIGINT) s, (i-1)%16 j, v FROM x),
       cb AS (SELECT vec_id cw, s, j, v FROM sub WHERE vec_id < 64),
       dist AS (SELECT a.vec_id, a.s, c.cw,
                  round(SUM((CAST(a.v AS DOUBLE)-CAST(c.v AS DOUBLE))*(CAST(a.v AS DOUBLE)-CAST(c.v AS DOUBLE))), 6) d
                FROM sub a JOIN cb c ON a.s = c.s AND a.j = c.j
                GROUP BY 1, 2, 3),
       best AS (SELECT vec_id, s, cw FROM (
                  SELECT vec_id, s, cw,
                    row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cw) rn
                  FROM dist) t WHERE rn = 1)
       SELECT vec_id, s, cw AS code FROM best ORDER BY vec_id, s""") { (spark, sfDir) =>
    val e = t(spark, sfDir, "embeddings")
    Similarity.quantizePQ(e, e.filter(col("vec_id") < 64), m = 4)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("s", "code")))
      .select(col("vec_id"), col("s").cast("long").as("s"), col("code"))
      .orderBy("vec_id", "s")
  }

  declare("embed_norms_by_label",
    """WITH x AS (SELECT vec_id, label, unnest(embedding) v FROM embeddings),
       norms AS (SELECT vec_id, label, sqrt(SUM(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) nn
                 FROM x GROUP BY 1, 2)
       SELECT label, COUNT(*) n, round(AVG(nn), 3) avg_norm
       FROM norms GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    t(spark, sfDir, "embeddings")
      .select(col("label"), Similarity.norm(col("embedding")).as("nn"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("nn"), 3).as("avg_norm"))
      .orderBy("label")
  }

  declare("text_tfidf_top",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok
         FROM documents),
       tf AS (SELECT doc_id, tok, COUNT(*) tf FROM toks GROUP BY 1, 2),
       dfreq AS (SELECT tok, COUNT(*) df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
       r AS (SELECT t.doc_id, t.tok, t.tf, d.df,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                 ORDER BY CAST(t.tf AS DOUBLE)/d.df DESC, t.tok) rn
             FROM tf t JOIN dfreq d USING (tok))
       SELECT doc_id, rn, tok, tf, df FROM r
       WHERE rn <= 3 AND doc_id < 50
       ORDER BY doc_id, rn""") { (spark, sfDir) =>
    TextAnalysis.topTermsByTfIdf(t(spark, sfDir, "documents"), k = 3)
      .filter(col("doc_id") < 50)
      .orderBy("doc_id", "rn")
  }

  // Okapi BM25 ranked retrieval (round 16; Robertson & Walker 1994) —
  // the lexical baseline RAG stacks measure embedding search against.
  // k1 = 1.2, b = 0.75 chosen as RATIONALS so the tf normalization
  // multiplies through to the exact integer ratio
  // 22·T·tf / (10·T·tf + 3·T + 9·dl·N); the only float is the idf ln,
  // and each (doc, term) contribution floors to MICRO units BEFORE the
  // per-doc sum — an integer sum both engines compute identically (a
  // float sum would reorder across partitionings; ln matches across
  // libms, the corpus-divergence precedent). Negative idf for
  // >half-corpus terms participates as-is (standard Robertson).
  declare("text_bm25_rank",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok
         FROM documents),
       stats AS (SELECT doc_id, len(string_split(text, ' ')) dl FROM documents),
       tot AS (SELECT COUNT(*) n, SUM(dl) t FROM stats),
       q AS (SELECT unnest(['data', 'merge', 'window']) AS tok),
       qt AS (SELECT doc_id, t.tok FROM toks t JOIN q USING (tok)),
       dfreq AS (SELECT tok, COUNT(*) df
                 FROM (SELECT DISTINCT doc_id, tok FROM qt) GROUP BY 1),
       tf AS (SELECT doc_id, tok, COUNT(*) tf FROM qt GROUP BY 1, 2),
       perterm AS (SELECT f.doc_id,
           CAST(floor(1e6 *
             ln((CAST(tot.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) *
             (22.0 * tot.t * f.tf) /
             (10.0 * tot.t * f.tf + 3.0 * tot.t + 9.0 * tot.n * s.dl))
             AS BIGINT) AS micro
         FROM tf f JOIN dfreq d USING (tok) JOIN stats s USING (doc_id)
         CROSS JOIN tot),
       scored AS (SELECT doc_id, SUM(micro) score_micro FROM perterm GROUP BY 1),
       ranked AS (SELECT doc_id, score_micro,
           ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) rn
         FROM scored)
       SELECT CAST(rn AS BIGINT) AS rank, doc_id,
         CAST(score_micro AS BIGINT) AS score_micro
       FROM ranked WHERE rn <= 10 ORDER BY rank""") { (spark, sfDir) =>
    TextAnalysis.bm25Rank(t(spark, sfDir, "documents"),
      Seq("data", "merge", "window"), k = 10).orderBy("rank")
  }

  declare("text_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) tok FROM documents),
       cnt AS (SELECT tok, COUNT(*) n FROM toks GROUP BY 1),
       r AS (SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) rn FROM cnt)
       SELECT rn, tok, n FROM r WHERE rn <= 10 ORDER BY rn""") { (spark, sfDir) =>
    // Heavy hitters via the approx_top_k sketch (the streaming-friendly
    // top-k aggregate). Tracked items exceed the corpus vocabulary, so
    // the sketch is EXACT here and the re-ranked output hash-matches the
    // exact-count oracle; at true scale the same plan degrades gracefully
    // to approximate counts.
    import org.apache.spark.sql.expressions.Window
    Engine.registerViews(spark, sfDir)
    val w = Window.orderBy(col("n").desc, col("tok"))
    spark.sql(
      """SELECT approx_top_k(tok, 10000, 100000) AS tk
         FROM (SELECT explode(split(text, ' ')) AS tok FROM documents)""")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("tok"), col("e.count").as("n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select("rn", "tok", "n")
      .orderBy("rn")
  }

  declare("text_edit_distance",
    """WITH r AS (SELECT substr(text, 1, 40) AS ref FROM documents WHERE doc_id = 0)
       SELECT doc_id, CAST(levenshtein(substr(text, 1, 40), ref) AS BIGINT) AS lev
       FROM documents, r WHERE doc_id BETWEEN 1 AND 15
       ORDER BY doc_id""") { (spark, sfDir) =>
    // Edit-distance scalar (fuzzy title/record matching): both engines
    // implement classic Levenshtein, so distances agree exactly.
    val docs = t(spark, sfDir, "documents")
    val ref = docs.filter(col("doc_id") === 0)
      .select(substring(col("text"), 1, 40).as("ref"))
    docs.filter(col("doc_id").between(1, 15))
      .crossJoin(broadcast(ref))
      .select(col("doc_id"),
        levenshtein(substring(col("text"), 1, 40), col("ref")).cast("long").as("lev"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------- skew
  declare("skew_salted_agg",
    """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS total
       FROM events GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    // Hot-key aggregation through the explicit two-phase salt: a handful
    // of event types carry every row, so the partial aggregates per
    // (key, salt) spread each hot key over 16 reducers; results equal the
    // plain groupBy exactly (deterministic salt, integer values).
    import graft.operators.Skew
    val ev = Engine.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
    Skew.saltedCountSum(ev, "event_type", "cents", salt = 16)
      .select(col("event_type"), col("n"), col("total").cast("long").as("total"))
      .orderBy("event_type")
  }

  // --------------------------------------------------------- streaming
  declare("events_stream_hourly",
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS value_cents
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    EventsStreaming.hourlyCounts(spark, sfDir)
  }

  declare("events_stream_enriched",
    """SELECT c_mktsegment, event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS value_cents
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    EventsStreaming.enrichedBySegment(spark, sfDir)
  }

  // Native session windows INSIDE the streaming engine (merging session
  // state per user as micro-batches arrive) — the streaming twin of the
  // batch q33_session_window; same DuckDB islands oracle.
  declare("events_stream_sessions",
    """WITH marked AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id,
           CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END new_sess
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), sess AS (
         SELECT user_id, ts,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess_id
         FROM marked
       )
       SELECT user_id,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) session_start_epoch,
         COUNT(*) n_events
       FROM sess GROUP BY user_id, sess_id
       ORDER BY user_id, session_start_epoch""") { (spark, sfDir) =>
    EventsStreaming.sessionWindows(spark, sfDir)
  }

  // Distributed point-in-interval join (round 15): events against 60
  // OVERLAPPING 18-hour windows at 12-hour stride. Spark plans a bare
  // range predicate as a nested-loop scan; RangeJoin bucketizes (6-hour
  // buckets — each interval replicates to ≤4, each point lands in ONE)
  // so the plan is a shuffled equi-join with a residual predicate —
  // AQE-sizeable at any scale. The oracle runs DuckDB's own
  // inequality join over the identical windows.
  declare("events_interval_join",
    """WITH win AS (SELECT printf('w%02d', i) win,
           1704067200 + i*43200 lo, 1704067200 + i*43200 + 64800 hi
         FROM (SELECT unnest(generate_series(0, 59)) i)),
       ev AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) t, value FROM events)
       SELECT win, CAST(COUNT(*) AS BIGINT) n_events,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) value_cents
       FROM win JOIN ev ON t >= lo AND t < hi
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    val ev = t(spark, sfDir, "events")
      .select(col("event_id"), col("ts").cast("long").as("t"), col("value"))
    val win = spark.range(60).select(
      concat(lit("w"), lpad(col("id").cast("string"), 2, "0")).as("win"),
      (lit(1704067200L) + col("id") * 43200L).as("lo"),
      (lit(1704067200L) + col("id") * 43200L + 64800L).as("hi"))
    RangeJoin.intervalJoin(ev, "t", win, "lo", "hi", bucketWidth = 21600L)
      .groupBy("win")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .orderBy("win")
  }

  // ------------------------------------------- training-batch prep
  declare("tokens_pack",
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) n_tok FROM documents),
       c AS (SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS bef
             FROM d),
       s AS (SELECT doc_id, n_tok, CAST(floor(bef / 1000.0) AS BIGINT) shard_id FROM c)
       SELECT shard_id, COUNT(*) n_docs, MIN(doc_id) first_doc, MAX(doc_id) last_doc,
         CAST(SUM(n_tok) AS BIGINT) shard_tokens
       FROM s GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    TextAnalysis.packShards(t(spark, sfDir, "documents"), budgetTokens = 1000)
      .orderBy("shard_id")
  }

  // BPE trainer's first-round pair table (round 15): frequency-weighted
  // adjacent character pairs over the distinct-word table — "which
  // merges would training learn first". The engine's corpus pass is the
  // word-frequency build; everything after runs on the Zipf-small vocab
  // (the two-level shape the full Bpe.train iterates — its merge loop is
  // spec-pinned against a hand-computed corpus in PipelineSpec).
  declare("tokens_bpe_pairs",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) word FROM documents),
       wf AS (SELECT word, COUNT(*) f FROM w WHERE word <> '' GROUP BY 1),
       px AS (SELECT word, f, unnest(generate_series(1, length(word)-1)) i FROM wf),
       pc AS (SELECT substr(word, i, 1) a, substr(word, i+1, 1) b,
                CAST(SUM(f) AS BIGINT) cnt
              FROM px GROUP BY 1, 2)
       SELECT a, b, cnt FROM pc ORDER BY cnt DESC, a, b LIMIT 20""") { (spark, sfDir) =>
    Bpe.pairStats(t(spark, sfDir, "documents"), k = 20)
  }

  // BPE tokenizer APPLICATION (round 15): encode the corpus under a
  // fixed 3-merge model — (s,c), (a,n), then the SYMBOL-level (sc,an) —
  // and roll up per-source word/char/subtoken counts. Encoding runs on
  // the Zipf-small distinct-word table with the merge list broadcast
  // (Bpe.encode), then joins back to the corpus by word. The merge set
  // is chosen interaction-free so the oracle can recompute subtoken
  // counts EXACTLY in SQL: each merge removes one symbol per occurrence,
  // 'sc'/'an' share no characters (every occurrence merges — L2R
  // non-overlap never skips), and an (sc)(an) symbol adjacency is
  // precisely a 'scan' substring, so n_sub = len − occ(sc) − occ(an) −
  // occ(scan) with replace()-based L2R occurrence counting. The general
  // trained-merge path is spec-pinned (encode∘train round-trip).
  declare("tokens_bpe_encode",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) word FROM documents),
       ww AS (SELECT source, len(word) nc,
                (len(word) - len(replace(word, 'sc', ''))) // 2 o1,
                (len(word) - len(replace(word, 'an', ''))) // 2 o2,
                (len(word) - len(replace(word, 'scan', ''))) // 4 o3
              FROM w WHERE word <> '')
       SELECT source, CAST(COUNT(*) AS BIGINT) n_words,
         CAST(SUM(nc) AS BIGINT) n_chars,
         CAST(SUM(nc - o1 - o2 - o3) AS BIGINT) n_subtokens
       FROM ww GROUP BY source ORDER BY source""") { (spark, sfDir) =>
    val docs = t(spark, sfDir, "documents")
    val enc = Bpe.encode(docs, Seq(("s", "c"), ("a", "n"), ("sc", "an")))
    docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(enc.select(col("word"), length(col("word")).cast("long").as("nc"),
        col("n_sub")), Seq("word"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum("nc").as("n_chars"),
        sum("n_sub").as("n_subtokens"))
      .orderBy("source")
  }

  declare("lm_unigram_freq",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents),
       vocab AS (SELECT tok, COUNT(*) freq FROM toks GROUP BY 1)
       SELECT t.doc_id, COUNT(*) n_tokens, CAST(SUM(v.freq) AS BIGINT) freq_sum,
         CAST(SUM(CASE WHEN v.freq < 2 THEN 1 ELSE 0 END) AS BIGINT) n_rare,
         MIN(v.freq) min_freq
       FROM toks t JOIN vocab v USING (tok)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    TextAnalysis.unigramFreqScore(t(spark, sfDir, "documents"), rareBelow = 2)
      .orderBy("doc_id")
  }

  declare("lm_bigram_freq",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents WHERE doc_id < 200),
       occ AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(ws)-1, 0)),
                 i -> ws[i] || ' ' || ws[i+1])) bg FROM d),
       freq AS (SELECT bg, COUNT(*) freq FROM occ GROUP BY 1)
       SELECT o.doc_id, COUNT(*) n_bigrams, CAST(SUM(f.freq) AS BIGINT) freq_sum,
         CAST(SUM(CASE WHEN f.freq < 2 THEN 1 ELSE 0 END) AS BIGINT) n_rare,
         MIN(f.freq) min_freq
       FROM occ o JOIN freq f USING (bg)
       GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    TextAnalysis.bigramFreqScore(
        t(spark, sfDir, "documents").filter(col("doc_id") < 200), rareBelow = 2)
      .orderBy("doc_id")
  }

  declare("sample_stratified",
    """WITH r AS (SELECT doc_id, lang AS stratum,
         ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
       FROM documents)
       SELECT doc_id, stratum, rn FROM r WHERE rn <= 5
       ORDER BY stratum, rn""") { (spark, sfDir) =>
    TextAnalysis.stratifiedSample(t(spark, sfDir, "documents"),
        stratumCol = "lang", perStratum = 5)
      .orderBy("stratum", "rn")
  }

  // Temperature sampling (round 15): the α=1/2 source-rebalancing draw
  // (mT5 §3.1 recipe) over the skewed lang distribution — en's raw
  // share flattens toward the tail languages. Weights are
  // floor(sqrt(c)·1000) BIGINTs and quotas integer-divide, so the
  // arithmetic is exact on both engines (a free-α pow would differ in
  // the last ulp across libms); draws are the md5-ranked stratified
  // prefix, quota-deep per language.
  declare("sample_temperature",
    """WITH counts AS (SELECT lang AS stratum, COUNT(*) c FROM documents GROUP BY 1),
       w AS (SELECT stratum, CAST(floor(sqrt(c) * 1000) AS BIGINT) w FROM counts),
       tw AS (SELECT SUM(w) tw FROM w),
       quotas AS (SELECT stratum, CAST((200 * w) // tw AS BIGINT) quota
                  FROM w CROSS JOIN tw),
       r AS (SELECT doc_id, lang AS stratum,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rn
             FROM documents)
       SELECT doc_id, stratum AS source, rn, quota
       FROM r JOIN quotas USING (stratum)
       WHERE rn <= quota
       ORDER BY source, rn""") { (spark, sfDir) =>
    TextAnalysis.temperatureSample(t(spark, sfDir, "documents"),
        sourceCol = "lang", totalN = 200L)
      .orderBy("source", "rn")
  }

  // Windowed PMI collocations — phrase/stopword discovery for tokenizer
  // and filter design. Row-local pair generation (no positions self-join),
  // PMI as the ratio (no cross-engine log), exact-integer counts through
  // the identical IEEE expression → the top-50 is hash-stable.
  declare("text_collocations",
    """WITH toks AS (SELECT string_split(coalesce(text, ''), ' ') ws FROM documents),
       pairs0 AS (SELECT flatten(list_transform(generate_series(1, greatest(len(ws)-1, 0)),
                    i -> list_transform(ws[i+1 : least(i+2, len(ws))],
                      t -> [least(ws[i], t), greatest(ws[i], t)]))) ps FROM toks),
       pairs AS (SELECT p[1] AS x, p[2] AS y FROM pairs0, unnest(ps) u(p)),
       pos AS (SELECT unnest(ws) AS tok FROM toks),
       pc AS (SELECT x, y, COUNT(*) nab FROM pairs GROUP BY 1, 2),
       tc AS (SELECT tok, COUNT(*) n FROM pos GROUP BY 1),
       tot AS (SELECT (SELECT COUNT(*) FROM pos) nt, (SELECT COUNT(*) FROM pairs) np)
       SELECT x, y, nab AS n_pair,
         round(CAST(nab AS DOUBLE) * nt * nt / (CAST(ta.n AS DOUBLE) * tb.n * np), 6) AS pmi_ratio
       FROM pc JOIN tc ta ON x = ta.tok JOIN tc tb ON y = tb.tok CROSS JOIN tot
       WHERE nab >= 5
       ORDER BY pmi_ratio DESC, x, y LIMIT 50""") { (spark, sfDir) =>
    TextAnalysis.collocations(t(spark, sfDir, "documents"),
      window = 2, minCount = 5, topK = 50)
  }

  // Deterministic train/valid/test assignment: split = pure function of
  // md5(doc_id) vs cumulative weight thresholds, so a document keeps its
  // split across reruns AND corpus growth (leak-free by construction,
  // unlike seeded randomSplit which reshuffles when the input changes).
  // Thresholds derived from the identical float expression in both
  // engines — the whole assignment is hash-compared, not just the sizes.
  private val splitSpec = Seq("train" -> 8.0, "valid" -> 1.0, "test" -> 1.0)
  declare("sample_split",
    s"""SELECT doc_id,
          ${TextAnalysis.hashSplitOracleCase(splitSpec, "doc_id")} AS split
        FROM documents ORDER BY doc_id""") { (spark, sfDir) =>
    TextAnalysis.hashSplit(t(spark, sfDir, "documents"), splitSpec)
      .select("doc_id", "split").orderBy("doc_id")
  }

  declare("dedup_incremental",
    """WITH known AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
       inc AS (
         SELECT doc_id, text FROM documents WHERE doc_id >= 400
         UNION ALL SELECT doc_id + 20000, text FROM documents WHERE doc_id < 5
         UNION ALL SELECT doc_id + 30000, text FROM documents WHERE doc_id BETWEEN 400 AND 404),
       keep AS (
         SELECT MIN(i.doc_id) AS doc_id
         FROM inc i
         WHERE NOT EXISTS (SELECT 1 FROM known k WHERE md5(k.text) = md5(i.text))
         GROUP BY md5(i.text))
       SELECT doc_id FROM inc WHERE doc_id IN (SELECT doc_id FROM keep)
       ORDER BY doc_id""") { (spark, sfDir) =>
    // Increment = the tail of the corpus + planted copies of KNOWN docs
    // (must drop: archive collision) + planted copies of increment docs
    // (must drop: within-batch duplicate, min id wins).
    val docs = t(spark, sfDir, "documents").select("doc_id", "text")
    val known = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
      .union(docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      .union(docs.filter(col("doc_id").between(400, 404))
        .select((col("doc_id") + 30000).as("doc_id"), col("text")))
    Dedup.incrementalExact(inc, known).select("doc_id").orderBy("doc_id")
  }

  declare("dedup_normalized",
    """WITH aug AS (
         SELECT doc_id, text FROM documents WHERE doc_id < 100
         UNION ALL
         SELECT doc_id + 40000, upper(text) || '!!' FROM documents WHERE doc_id < 10),
       norm AS (SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g')) AS ntext
         FROM aug),
       g AS (SELECT md5(ntext) h, MIN(doc_id) kept_id, COUNT(*) n
             FROM norm GROUP BY 1 HAVING COUNT(*) > 1)
       SELECT n2.doc_id AS dup_id, g.kept_id
       FROM norm n2 JOIN g ON md5(n2.ntext) = g.h
       WHERE n2.doc_id != g.kept_id
       ORDER BY dup_id""") { (spark, sfDir) =>
    // Normalization-insensitive dedup (the C4 canonical form): planted
    // SHOUTING+punctuated copies hash identically after normalization and
    // are caught by plain exact dedup over the normalized column.
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 100)
      .select("doc_id", "text")
    val aug = docs.union(
      t(spark, sfDir, "documents").filter(col("doc_id") < 10)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat(upper(col("text")), lit("!!")).as("text")))
    Dedup.exact(aug.select(col("doc_id"),
        TextAnalysis.normalizeForDedup(col("text")).as("text")))
      .orderBy("dup_id")
  }

  declare("text_redact_pii",
    """WITH aug AS (
         SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
             THEN text || ' contact bob@example.com or call 555-123-4567 from 10.0.0.1'
             ELSE text END AS text
         FROM documents WHERE doc_id < 50)
       SELECT doc_id,
         regexp_replace(t2, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS clean_text,
         len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email,
         len(regexp_extract_all(t1, '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
         len(regexp_extract_all(t2, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ip
       FROM (
         SELECT doc_id, text, t1,
           regexp_replace(t1, '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS t2
         FROM (
           SELECT doc_id, text,
             regexp_replace(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t1
           FROM aug))
       ORDER BY doc_id""") { (spark, sfDir) =>
    // PII is planted (the synthetic corpus has none) so the redaction and
    // counts are exercised on every 7th document. Each count runs on the
    // text as it stood at that redaction stage (sequential-fold
    // semantics, mirrored in TextAnalysis.redactPii): a phone-looking
    // digit run already swallowed by the email pass must not count.
    val aug = t(spark, sfDir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit(" contact bob@example.com or call 555-123-4567 from 10.0.0.1")))
          .otherwise(col("text")).as("text"))
    TextAnalysis.redactPii(aug).orderBy("doc_id")
  }

  declare("text_decontaminate",
    """WITH c AS (SELECT doc_id, text FROM documents WHERE doc_id >= 10),
       p AS (SELECT doc_id, text FROM documents WHERE doc_id < 10),
       cs0 AS (SELECT doc_id, string_split(text, ' ') ws FROM c),
       cs1 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) gs FROM cs0),
       cs AS (SELECT DISTINCT doc_id, unnest(gs) AS shingle FROM cs1),
       ps0 AS (SELECT doc_id, string_split(text, ' ') ws FROM p),
       ps1 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) gs FROM ps0),
       ps AS (SELECT DISTINCT doc_id, unnest(gs) AS shingle FROM ps1)
       SELECT cs.doc_id AS corpus_id, ps.doc_id AS probe_id, COUNT(*) AS shared_ngrams
       FROM cs JOIN ps USING (shingle)
       GROUP BY 1, 2 ORDER BY 1, 2""") { (spark, sfDir) =>
    // Benchmark decontamination: docs 0-9 stand in for the eval set; any
    // 5-gram collision marks a training document for quarantine.
    val docs = t(spark, sfDir, "documents")
    TextAnalysis.crossCorpusOverlap(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10), n = 5)
      .orderBy("corpus_id", "probe_id")
  }

  // N-gram novelty scoring (round 15) — the data-selection dual of
  // decontamination: per candidate doc, the per-mille of its distinct
  // 5-grams the reference corpus (docs ≥ 100) has never seen. High
  // novelty = high marginal information per training token. Linear in
  // corpus + reference (distinct-shingle sets, one co-partitioned
  // membership join, map-side-combined per-doc fold).
  declare("text_ngram_novelty",
    """WITH c AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
       r AS (SELECT text FROM documents WHERE doc_id >= 100),
       cs0 AS (SELECT doc_id, string_split(text, ' ') ws FROM c),
       cs1 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) gs FROM cs0),
       cs AS (SELECT DISTINCT doc_id, unnest(gs) AS shingle FROM cs1),
       rs0 AS (SELECT string_split(text, ' ') ws FROM r),
       rs1 AS (SELECT list_transform(generate_series(1, greatest(len(ws)-4, 0)),
                 i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) gs FROM rs0),
       rs AS (SELECT DISTINCT unnest(gs) AS shingle FROM rs1),
       j AS (SELECT doc_id, COUNT(*) n_grams,
               SUM(CASE WHEN rs.shingle IS NULL THEN 1 ELSE 0 END) n_novel
             FROM cs LEFT JOIN rs USING (shingle) GROUP BY 1)
       SELECT doc_id, CAST(n_grams AS BIGINT) n_grams, CAST(n_novel AS BIGINT) n_novel,
         CAST(floor(n_novel * 1000.0 / n_grams) AS BIGINT) novelty_millis
       FROM j
       UNION ALL
       SELECT doc_id, 0, 0, 0 FROM c
       WHERE text IS NULL OR len(string_split(text, ' ')) < 5
       ORDER BY doc_id""") { (spark, sfDir) =>
    val docs = t(spark, sfDir, "documents")
    TextAnalysis.ngramNovelty(
        docs.filter(col("doc_id") < 100), docs.filter(col("doc_id") >= 100), n = 5)
      .orderBy("doc_id")
  }

  declare("text_repetition",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents WHERE doc_id < 100),
       tri AS (SELECT doc_id, len(ws) n_tok,
                 list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) tg FROM d),
       base AS (SELECT doc_id, n_tok, len(tg) n_tri, len(list_distinct(tg)) n_tri_uniq FROM tri),
       tok AS (SELECT doc_id, unnest(ws) tok FROM d),
       cnt AS (SELECT doc_id, tok, COUNT(*) c FROM tok GROUP BY 1, 2),
       top AS (SELECT doc_id, MAX(c) top_tok_count FROM cnt GROUP BY 1)
       SELECT b.doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(CASE WHEN n_tri > 0 THEN floor((n_tri - n_tri_uniq)*1000.0/n_tri) ELSE 0 END AS BIGINT)
           AS dup_trigram_millis,
         CAST(top_tok_count AS BIGINT) AS top_tok_count,
         CAST(floor(top_tok_count*1000.0/n_tok) AS BIGINT) AS top_tok_millis
       FROM base b JOIN top t ON b.doc_id = t.doc_id
       ORDER BY b.doc_id""") { (spark, sfDir) =>
    TextAnalysis.repetitionMetrics(
        t(spark, sfDir, "documents").filter(col("doc_id") < 100))
      .orderBy("doc_id")
  }

  declare("text_line_dedup",
    """WITH base AS (SELECT doc_id,
           'NAV MENU' || chr(10) || text || chr(10) || 'FOOTER-' || CAST(doc_id % 2 AS VARCHAR) AS text
         FROM documents WHERE doc_id < 60),
       lines AS (SELECT doc_id,
           unnest(string_split(text, chr(10))) AS line,
           unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
         FROM base),
       boiler AS (SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines) t
         GROUP BY line HAVING COUNT(*) >= 10),
       agg AS (SELECT l.doc_id,
           string_agg(CASE WHEN b.line IS NULL THEN l.line END, chr(10) ORDER BY l.pos) AS clean_text,
           CAST(COUNT(*) FILTER (WHERE b.line IS NULL) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (WHERE b.line IS NOT NULL) AS BIGINT) AS n_removed
         FROM lines l LEFT JOIN boiler b USING (line) GROUP BY l.doc_id)
       SELECT doc_id, COALESCE(clean_text, '') AS clean_text, n_kept, n_removed
       FROM agg ORDER BY doc_id""") { (spark, sfDir) =>
    // Line-level boilerplate dedup: every document gets a shared nav
    // header (df = 60) and one of two footers (df = 30) planted around its
    // body; the pass strips lines in >= 10 distinct docs, so the planted
    // chrome goes and each body line (df 1-2, incl. natural dup texts)
    // survives. The oracle COMPUTES the boilerplate set through the same
    // df rule rather than assuming the plant.
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 60)
      .select(col("doc_id"), concat(lit("NAV MENU\n"), col("text"),
        lit("\nFOOTER-"), (col("doc_id") % 2).cast("string")).as("text"))
    TextAnalysis.dedupLines(docs, minDf = 10).orderBy("doc_id")
  }

  // Span-level dedup metrics (Lee et al. 2022 recast as an n-gram
  // inverted index): positions covered by a 10-gram occurring in >= 2
  // distinct docs, rolled up per doc into duplicated-token and
  // maximal-span counts. The planted full-duplicate pairs guarantee
  // fully-covered docs; any natural cross-doc 10-gram repeats are
  // counted identically by both engines (the oracle computes the same
  // inverted index, never assuming the plant).
  declare("text_span_stats",
    s"""WITH corpus AS (SELECT * FROM $plantedCorpusSql c(doc_id, text)),
       toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       g AS (SELECT doc_id, s, array_to_string(list_slice(ws, s, s + 9), ' ') AS gram
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(len(ws) - 9, 0))) AS s
                   FROM toks) u),
       hot AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g) t
               GROUP BY gram HAVING COUNT(*) >= 2),
       pos AS (SELECT DISTINCT doc_id, p FROM
               (SELECT doc_id, unnest(generate_series(s, s + 9)) AS p
                FROM g WHERE gram IN (SELECT gram FROM hot)) u),
       sp AS (SELECT doc_id,
                CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
                     THEN 0 ELSE 1 END AS ns
              FROM pos),
       agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_tokens,
                 CAST(SUM(ns) AS BIGINT) AS n_spans
               FROM sp GROUP BY 1)
       SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
              a.dup_tokens, a.n_spans
       FROM toks t JOIN agg a USING (doc_id) ORDER BY doc_id""") { (spark, sfDir) =>
    TextAnalysis.spanDupStats(plantedCorpus(t(spark, sfDir, "documents")))
      .orderBy("doc_id")
  }

  // Exact-substring span dedup by suffix-key SORT (round 16; Lee et al.
  // 2022's ExactSubstr shape — sort length-bounded suffix keys, mark
  // neighbor-equal runs spanning >= 2 documents): maximal duplicated
  // spans of ANY length >= 15 tokens as (doc_id, start, end, len) rows.
  // The plant: doc 50000+i wraps a 31-token excerpt of doc i (tokens
  // 10..40) in two doc-unique pad tokens, so each pair shares one
  // 31-token span with interior boundaries — reported as ONE maximal
  // run, not seventeen 15-grams. The oracle recomputes the identical
  // position set relationally (15-gram inverted index + gaps-and-islands
  // runs — output-equivalent to the suffix sort by construction); the
  // engine runs the ONE-shuffle sorted-neighbor plan the paper uses.
  declare("text_span_suffix",
    """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
       tok0 AS (SELECT doc_id, string_split(text, ' ') ws FROM d0),
       chim AS (SELECT doc_id + 50000 AS doc_id,
                  'cpre' || doc_id || ' ' ||
                  array_to_string(list_slice(ws, 10, 40), ' ') ||
                  ' cpost' || doc_id AS text
                FROM tok0 WHERE len(ws) >= 60),
       corpus AS (SELECT * FROM d0 UNION ALL SELECT * FROM chim),
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM corpus),
       g AS (SELECT doc_id, s, array_to_string(list_slice(ws, s, s + 14), ' ') AS k
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(len(ws) - 14, 0))) AS s
                   FROM toks) u),
       hot AS (SELECT k FROM (SELECT DISTINCT doc_id, k FROM g) t
               GROUP BY k HAVING COUNT(*) >= 2),
       pos AS (SELECT DISTINCT doc_id, p FROM
               (SELECT doc_id, unnest(generate_series(s, s + 14)) AS p
                FROM g WHERE k IN (SELECT k FROM hot)) u),
       isl AS (SELECT doc_id, p,
                 p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
               FROM pos)
       SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
         CAST(MAX(p) AS BIGINT) AS span_end,
         CAST(MAX(p) - MIN(p) + 1 AS BIGINT) AS span_len
       FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""") {
    (spark, sfDir) =>
    val d0 = t(spark, sfDir, "documents").filter(col("doc_id") < 40)
      .select("doc_id", "text")
    val tok0 = d0.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val chim = tok0.filter(size(col("ws")) >= 60)
      .select((col("doc_id") + 50000).as("doc_id"),
        concat(concat(lit("cpre"), col("doc_id")), lit(" "),
          concat_ws(" ", slice(col("ws"), 10, 31)), lit(" "),
          concat(lit("cpost"), col("doc_id"))).as("text"))
    SuffixSpans.dupSpans(d0.union(chim), minLen = 15)
      .orderBy("doc_id", "span_start")
  }

  // Span-level SCRUB over a corpus with PARTIAL overlap: chimera docs
  // (20000+i) splice the first 25 tokens of doc i onto tokens 26.. of
  // doc i+1, so the copied regions are duplicated spans while the seam
  // 10-grams stay unique — the scrub must remove the copied prefix and
  // suffix but keep the seam, a case doc-level dedup cannot express.
  declare("text_span_scrub",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 12),
       ab AS (SELECT a.doc_id AS ia, string_split(a.text, ' ') AS wa,
                string_split(b.text, ' ') AS wb
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
       chim AS (SELECT ia + 20000 AS doc_id,
                  array_to_string(list_concat(list_slice(wa, 1, 25),
                    list_slice(wb, 26, 1048576)), ' ') AS text
                FROM ab),
       corpus AS (SELECT * FROM d UNION ALL SELECT * FROM chim),
       toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       g AS (SELECT doc_id, s, array_to_string(list_slice(ws, s, s + 9), ' ') AS gram
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(len(ws) - 9, 0))) AS s
                   FROM toks) u),
       hot AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g) t
               GROUP BY gram HAVING COUNT(*) >= 2),
       pos AS (SELECT DISTINCT doc_id, p FROM
               (SELECT doc_id, unnest(generate_series(s, s + 9)) AS p
                FROM g WHERE gram IN (SELECT gram FROM hot)) u),
       tok AS (SELECT doc_id, p, ws[p] AS tok FROM
               (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
                FROM toks) u),
       kept AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
                  string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text
                FROM tok t LEFT JOIN pos ON t.doc_id = pos.doc_id AND t.p = pos.p
                WHERE pos.p IS NULL GROUP BY 1)
       SELECT c.doc_id, CAST(len(c.ws) AS BIGINT) AS n_tokens,
              CAST(len(c.ws) - COALESCE(kept_tokens, 0) AS BIGINT) AS dup_tokens,
              COALESCE(clean_text, '') AS clean_text
       FROM toks c LEFT JOIN kept USING (doc_id) ORDER BY doc_id""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents").filter(col("doc_id") < 12)
      .select(col("doc_id"), col("text"))
    val a = d.select(col("doc_id").as("ia"), split(col("text"), " ").as("wa"))
    val b = d.select(col("doc_id").as("ib"), split(col("text"), " ").as("wb"))
    val chim = a.join(b, col("ib") === col("ia") + 1)
      .select((col("ia") + 20000).as("doc_id"),
        concat_ws(" ", concat(slice(col("wa"), 1, 25),
          slice(col("wb"), 26, 1048576))).as("text"))
    TextAnalysis.scrubDupSpans(d.union(chim)).orderBy("doc_id")
  }

  // The dedup TVF: the same near-dup pipeline as dedup_corpus_near,
  // driven entirely through spark.sql — SQL-only users reach the
  // iterative LSH + propagation engine as `FROM dedup(table, threshold)`.
  // Identical oracle; the label memo shares the propagation run with
  // dedup_corpus_near when both execute in one session.
  declare("dedup_corpus_sql",
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
       sh0 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(ws)-2, 0)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) shingles FROM toks),
       sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh0),
       sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY 1),
       inter AS (SELECT x.doc_id a, y.doc_id b, COUNT(*) i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a, b FROM inter
                 JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
                 WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8),
       edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       reach AS (
         SELECT x, x AS y FROM (SELECT DISTINCT x FROM edges) t
         UNION
         SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
       ),
       lab AS (SELECT x AS doc_id, MIN(y) AS label FROM reach GROUP BY 1)
       SELECT doc_id FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM lab WHERE doc_id != label)
       ORDER BY doc_id""") { (spark, sfDir) =>
    t(spark, sfDir, "documents").select("doc_id", "text")
      .createOrReplaceTempView("graft_dedup_sql_v")
    spark.sql(
      "SELECT doc_id FROM dedup('graft_dedup_sql_v', 0.8) ORDER BY doc_id")
  }

  // The span_scrub TVF over the same chimera corpus as text_span_scrub —
  // a pure lazy plan splice (nothing runs at analysis), so the ORDER BY
  // composes into the spliced plan like any subquery.
  declare("text_span_scrub_sql",
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 12),
       ab AS (SELECT a.doc_id AS ia, string_split(a.text, ' ') AS wa,
                string_split(b.text, ' ') AS wb
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
       chim AS (SELECT ia + 20000 AS doc_id,
                  array_to_string(list_concat(list_slice(wa, 1, 25),
                    list_slice(wb, 26, 1048576)), ' ') AS text
                FROM ab),
       corpus AS (SELECT * FROM d UNION ALL SELECT * FROM chim),
       toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       g AS (SELECT doc_id, s, array_to_string(list_slice(ws, s, s + 9), ' ') AS gram
             FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(len(ws) - 9, 0))) AS s
                   FROM toks) u),
       hot AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g) t
               GROUP BY gram HAVING COUNT(*) >= 2),
       pos AS (SELECT DISTINCT doc_id, p FROM
               (SELECT doc_id, unnest(generate_series(s, s + 9)) AS p
                FROM g WHERE gram IN (SELECT gram FROM hot)) u),
       tok AS (SELECT doc_id, p, ws[p] AS tok FROM
               (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
                FROM toks) u),
       kept AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
                  string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text
                FROM tok t LEFT JOIN pos ON t.doc_id = pos.doc_id AND t.p = pos.p
                WHERE pos.p IS NULL GROUP BY 1)
       SELECT c.doc_id, CAST(len(c.ws) AS BIGINT) AS n_tokens,
              CAST(len(c.ws) - COALESCE(kept_tokens, 0) AS BIGINT) AS dup_tokens,
              COALESCE(clean_text, '') AS clean_text
       FROM toks c LEFT JOIN kept USING (doc_id) ORDER BY doc_id""") { (spark, sfDir) =>
    val d = t(spark, sfDir, "documents").filter(col("doc_id") < 12)
      .select(col("doc_id"), col("text"))
    val a = d.select(col("doc_id").as("ia"), split(col("text"), " ").as("wa"))
    val b = d.select(col("doc_id").as("ib"), split(col("text"), " ").as("wb"))
    val chim = a.join(b, col("ib") === col("ia") + 1)
      .select((col("ia") + 20000).as("doc_id"),
        concat_ws(" ", concat(slice(col("wa"), 1, 25),
          slice(col("wb"), 26, 1048576))).as("text"))
    d.union(chim).createOrReplaceTempView("graft_span_sql_v")
    spark.sql("SELECT * FROM span_scrub('graft_span_sql_v') ORDER BY doc_id")
  }

  // Z-ORDER layout clustering (round 16): the lake-layout primitive
  // behind multi-column data skipping (Delta/Iceberg OPTIMIZE ZORDER BY)
  // — Morton-interleave the bits of two exactly-quantized columns and
  // range-partition + sort on the curve, so every written file's footer
  // stats stay tight on BOTH columns (the skipping win is measured via
  // the parquet_metadata row-group stats in PipelineSpec). Quantization
  // is pure Long multiply-then-divide and the interleave a shift/mask
  // fold, so the oracle recomputes z bit-for-bit. The declared output is
  // order-insensitive (keyed by event_id); the engine still runs the
  // real one-shuffle cluster() path.
  declare("layout_zorder", {
    val inter = (0 until 8).map(i =>
      s"(((qx >> $i) & 1) << ${2 * i}) | (((qy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    s"""WITH e AS (SELECT event_id, user_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE event_id < 200),
       b AS (SELECT MIN(user_id) mnx, MAX(user_id) mxx,
               MIN(cents) mny, MAX(cents) mxy FROM e),
       q AS (SELECT event_id,
               (user_id - mnx) * 255 // (mxx - mnx) AS qx,
               (cents - mny) * 255 // (mxy - mny) AS qy
             FROM e CROSS JOIN b)
       SELECT event_id, CAST($inter AS BIGINT) AS z
       FROM q ORDER BY event_id"""
  }) { (spark, sfDir) =>
    val e = graft.Engine.events(spark, sfDir)
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    ZOrder.cluster(e, "user_id", "cents", bits = 8)
      .select("event_id", "z").orderBy("event_id")
  }

  // LP-OPTIMAL data mixture under a character budget (round 16): the lane
  // where the reference's actual PURPOSE — mathematical optimization in
  // SQL — meets the pipeline scope. Per-source stats (capacity = total
  // chars, quality = mean chars per doc in millis with a deterministic
  // name-rank tiebreak, so objectives are strictly distinct) become a
  // data-derived LP: maximize Σ q_s·x_s s.t. Σ x_s <= budget,
  // 0 <= x_s <= cap_s — solved by the engine's OWN bounded simplex
  // through the reference's model surface (ModelRegistry +
  // HighsFunctions.solve, objective negated for the minimizer). This is
  // fractional knapsack, whose optimum under distinct ratios is the
  // UNIQUE greedy vertex — so the DuckDB oracle recomputes it as a
  // cumulative-sum window, no solver needed, and the comparison is
  // exact integers (caps/budget integral → the vertex is integral; the
  // stats collect is K-bounded: one row per source).
  declare("mix_lp_budget",
    """WITH stats AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) chars,
             COUNT(*) n FROM documents GROUP BY 1),
       q AS (SELECT source, chars,
               (1000 * chars // n) * 100 +
                 (ROW_NUMBER() OVER (ORDER BY source) - 1) AS qm
             FROM stats),
       b AS (SELECT SUM(chars) // 3 AS budget FROM stats),
       g AS (SELECT source, chars, qm,
               COALESCE(SUM(chars) OVER (ORDER BY qm DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             FROM q)
       SELECT source,
         CAST(LEAST(chars, GREATEST(0, (SELECT budget FROM b) - cumb)) AS BIGINT)
           AS x_chars
       FROM g ORDER BY source""") { (spark, sfDir) =>
    val stats = t(spark, sfDir, "documents")
      .groupBy("source")
      .agg(sum(col("n_chars")).cast("long").as("chars"),
        count(lit(1)).as("n"))
      .orderBy("source")
      .collect() // K-bounded: one row per source
    val qs = stats.zipWithIndex.map { case (r, i) =>
      val qm = Math.floorDiv(1000L * r.getLong(1), r.getLong(2)) * 100L + i
      (r.getString(0), r.getLong(1), qm)
    }
    val budget = qs.map(_._2).sum / 3L
    graft.highs.Workloads.register(spark, "graft_mix_lp",
      qs.toSeq.map { case (s, cap, qm) =>
        (s, 0.0, cap.toDouble, -qm.toDouble, "continuous") },
      Seq(("budget", -graft.highs.Workloads.Inf, budget.toDouble)),
      qs.toSeq.map { case (s, _, _) => ("budget", s, 1.0) })
    graft.highs.HighsFunctions.solve(spark, "graft_mix_lp")
      .select(col("variable_name").as("source"),
        round(col("solution_value")).cast("long").as("x_chars"))
      .orderBy("source")
  }

  // Deterministic corpus mixing toward target weights 4:2:1:1 over four
  // sources — the binding source keeps all rows, the rest downsample by
  // an md5-prefix threshold derived from the SAME float expression in
  // both engines (bit-identical IEEE ops), so the kept sets are equal,
  // not just equally sized.
  declare("sample_mixture",
    """WITH w AS (SELECT src, CAST(wt AS DOUBLE) AS wt FROM (VALUES
           ('src0', 4.0), ('src1', 2.0), ('src2', 1.0), ('src3', 1.0)) v(src, wt)),
       cnt AS (SELECT source AS src, COUNT(*) AS n
               FROM documents JOIN w ON source = w.src GROUP BY 1),
       mc AS (SELECT MIN(n / wt) AS c FROM cnt JOIN w USING (src)),
       thr AS (SELECT src, n,
                 lpad(lower(hex(least(
                   CAST(floor(((wt * c) / n) * 4294967296.0) AS BIGINT),
                   4294967295))), 8, '0') AS thr_hex
               FROM cnt JOIN w USING (src) CROSS JOIN mc),
       kept AS (SELECT d.source AS src, COUNT(*) AS k
                FROM documents d JOIN thr ON d.source = thr.src
                WHERE thr_hex = 'ffffffff'
                   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < thr_hex
                GROUP BY 1)
       SELECT thr.src AS source, CAST(thr.n AS BIGINT) AS n_in,
              CAST(k.k AS BIGINT) AS n_kept,
              CAST(floor(k.k * 1000.0 / thr.n) AS BIGINT) AS kept_millis
       FROM thr JOIN kept k USING (src) ORDER BY source""") { (spark, sfDir) =>
    val weights = Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)
    val docs = t(spark, sfDir, "documents")
    val kept = TextAnalysis.mixtureSample(docs, weights)
      .groupBy("source").agg(count(lit(1)).cast("long").as("n_kept"))
    val nIn = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .groupBy("source").agg(count(lit(1)).cast("long").as("n_in"))
    nIn.join(kept, Seq("source"))
      .select(col("source"), col("n_in"), col("n_kept"),
        floor(col("n_kept") * 1000.0 / col("n_in")).cast("long").as("kept_millis"))
      .orderBy("source")
  }

  // Stream-STREAM join (the kafka↔kafka funnel shape): click→purchase
  // attribution joined entirely inside the streaming engine — symmetric
  // hash join with watermark-bounded state on BOTH sides; the range
  // predicate on the two event-time columns is what lets the engine
  // evict (a click older than watermark − 30 min can never match a
  // future purchase). Batch-aggregated off the append sink; oracle is
  // the equivalent batch self-join in DuckDB.
  declare("events_stream_attrib",
    """SELECT user_id, n_pairs, n_purchases FROM (
         SELECT p.user_id AS user_id, COUNT(*) AS n_pairs,
                COUNT(DISTINCT p.event_id) AS n_purchases
         FROM events p JOIN events c
           ON c.user_id = p.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
          AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         GROUP BY 1
       ) ORDER BY user_id""") { (spark, sfDir) =>
    EventsStreaming.clickAttribution(spark, sfDir)
  }

  declare("events_stream_dedup",
    """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS value_cents
       FROM events GROUP BY 1 ORDER BY 1""") { (spark, sfDir) =>
    EventsStreaming.dedupCounts(spark, sfDir)
  }

  val declared: Seq[Declared] = all.result()

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.fn).toMap

  val oracles: Map[String, String] =
    declared.flatMap(d => d.oracle.map(o => d.name -> o.replaceAll("\\s+", " ").trim)).toMap
}
