package graft.operators

import graft.{GraftQuery, Tables}
import graft.mr.MapReduceJob
import graft.sources.{Corpus, PathGlob}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

/** The reference's ONE novel data-model semantic — hierarchy context
  * ("directory files", reference work.go:68-100 / mapreduce.go:152-204)
  * — under the hard DuckDB-oracle check, end to end through the real
  * engine path: a directory tree is materialized on disk, read back by
  * [[graft.sources.Corpus]] (binaryFile + recursive listing), and each
  * data file's ancestor-context stack is resolved by
  * [[graft.mr.ParentStacks]] (broadcast prefix resolution) inside a
  * [[graft.mr.MapReduceJob]] mapper.
  *
  * The corpus is DERIVED from the `documents` table (bounded: doc_id <
  * 300), laid out as `<lang>/<source>/doc_<id>.txt` with `ctx.txt`
  * directory files at the root, lang, and source levels — so the
  * oracle can recompute the expected context chain from the table
  * columns alone. The expected chain is `root|lang=<lang>` and NOT
  * `...|src=<source>`: a file must NOT see the directory file sitting
  * in its own folder (the reference's same-folder exclusion,
  * mapreduce.go:187-204) — the oracle therefore checks depth ordering
  * AND the exclusion rule, not just the join.
  */
object HierarchyQueries {

  final case class CtxRow(path: String, ctx: String, n_bytes: Long)

  /** Materialize the virtual corpus for one build. Driver-side file
    * writes are corpus SETUP (bounded at 300 + ~100 dirfiles), not the
    * operator — the operator is the distributed read + broadcast
    * prefix resolution that follows. */
  private def writeCorpus(s: SparkSession, d: String): String = {
    val root = graft.Scratch.dir("graft_mr01_")
    val rows = Tables.documents(s, d).filter(col("doc_id") < 300)
      .select("doc_id", "lang", "source", "text").collect()
    def put(rel: Path, content: String): Unit = {
      Files.createDirectories(rel.getParent)
      Files.write(rel, content.getBytes(UTF_8)); ()
    }
    put(Paths.get(root, "ctx.txt"), "root")
    rows.map(r => r.getString(1)).distinct.foreach(lang =>
      put(Paths.get(root, lang, "ctx.txt"), s"lang=$lang"))
    rows.map(r => (r.getString(1), r.getString(2))).distinct.foreach {
      case (lang, src) =>
        put(Paths.get(root, lang, src, "ctx.txt"), s"src=$src")
    }
    rows.foreach { r =>
      put(Paths.get(root, r.getString(1), r.getString(2),
        s"doc_${r.getLong(0)}.txt"), r.getString(3))
    }
    root
  }

  val mr01HierarchyContext: GraftQuery = GraftQuery(
    "mr01_hierarchy_context",
    (s, d) => {
      import s.implicits._
      val root = writeCorpus(s, d)
      val job = MapReduceJob[CtxRow, Unit](
        name = "mr01",
        filter = PathGlob("**/doc_*.txt"),
        mapper = (path, parents, content) => Iterator.single(CtxRow(
          path,
          parents.map(new String(_, UTF_8)).mkString("|"),
          content.length.toLong)),
        zero = (), fold = (_, _) => (), merge = (_, _) => (),
        directoryFiles = Some(PathGlob("**/ctx.txt")))
      job.mapped(Corpus.read(s, root)).toDF().orderBy("path")
    },
    Some("""SELECT lang || '/' || source || '/doc_' || doc_id || '.txt' AS path,
      |  'root|lang=' || lang AS ctx,
      |  CAST(STRLEN(text) AS BIGINT) AS n_bytes
      |FROM documents WHERE doc_id < 300
      |ORDER BY path""".stripMargin),
    "hierarchy context (directory files) through the real Corpus + ParentStacks path")

  val all: Seq[GraftQuery] = Seq(mr01HierarchyContext)
}
