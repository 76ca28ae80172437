package graft.sources

import java.util.regex.Pattern

/** Path predicate with the two evaluation modes the reference's
  * traversal needs (`Filter.Match` / `Filter.CouldMatch`,
  * reference `interfaces.go:4-7`): exact match for files, and
  * prefix-feasibility for directory-subtree pruning — the scan-time
  * pushdown that lets a corpus read skip whole subtrees
  * (reference `work.go:68-99`).
  */
sealed trait PathPredicate extends Serializable {
  /** Exact match of a full (root-relative, '/'-separated) file path. */
  def matches(path: String): Boolean
  /** Could any file at or strictly below this folder path match? */
  def couldMatch(folder: String): Boolean
  /** Longest literal directory prefix (as segments) under which EVERY
    * matching path lives — the listing-time subtree restriction: a
    * scan may descend from `root/prefix` instead of `root` and cannot
    * miss a match (reference `work.go:68-99`: the traversal never
    * enters a subtree no filter could match). Empty = no restriction. */
  def staticPrefix: Seq[String]
  def or(other: PathPredicate): PathPredicate = MultiGlob(Seq(this, other))
}

/** Disjunction of predicates (reference `MultiFilter`, glob.go:9-30). */
final case class MultiGlob(filters: Seq[PathPredicate]) extends PathPredicate {
  def matches(path: String): Boolean = filters.exists(_.matches(path))
  def couldMatch(folder: String): Boolean = filters.exists(_.couldMatch(folder))
  /** A match of ANY branch must stay reachable → the longest common
    * prefix of the branches' prefixes. */
  def staticPrefix: Seq[String] =
    if (filters.isEmpty) Nil
    else filters.map(_.staticPrefix).reduce { (a, b) =>
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
    }
}

/** Glob over '/'-separated paths: `*` is a within-segment wildcard
  * (usable partially, e.g. `*.json`); `**` matches zero or more whole
  * segments (globstar).
  *
  * This is a fresh segment-DP implementation, not a port of the
  * reference's two-ended matcher (glob.go:70-117): the reference's
  * documented failure cases — doubled and split globstars
  * (glob_test.go:65-88) — match correctly here, and partial-segment
  * regexes are compiled once per glob instead of per call (the perf
  * bug noted at glob.go:35).
  */
final case class PathGlob(pattern: String) extends PathPredicate {
  import PathGlob.{Exact, Globstar, RegexSeg, Segment}

  @transient private lazy val segs: Array[Segment] =
    pattern.split("/", -1).map {
      case "**" => Globstar
      case s if s.contains("*") =>
        RegexSeg(Pattern.compile(
          s.split("\\*", -1).map(Pattern.quote).mkString("[^/]*")))
      case s => Exact(s)
    }

  private def segMatch(seg: Segment, s: String): Boolean = seg match {
    case Globstar    => true // handled structurally, not per-segment
    case Exact(e)    => e == s
    case RegexSeg(p) => p.matcher(s).matches()
  }

  /** Can pattern segments [i..) match path segments [j..) exactly? */
  private def matchFrom(path: Array[String], i: Int, j: Int): Boolean = {
    if (i == segs.length) j == path.length
    else segs(i) match {
      case Globstar =>
        matchFrom(path, i + 1, j) || (j < path.length && matchFrom(path, i, j + 1))
      case seg =>
        j < path.length && segMatch(seg, path(j)) && matchFrom(path, i + 1, j + 1)
    }
  }

  /** Can pattern segments [i..) match some strict or non-strict
    * extension of path segments [j..)? True once the folder path is
    * fully consumed: whatever pattern remains can still match some
    * file deeper in the tree. */
  private def couldFrom(path: Array[String], i: Int, j: Int): Boolean = {
    if (j == path.length) true
    else if (i == segs.length) false
    else segs(i) match {
      case Globstar =>
        couldFrom(path, i + 1, j) || couldFrom(path, i, j + 1)
      case seg =>
        segMatch(seg, path(j)) && couldFrom(path, i + 1, j + 1)
    }
  }

  def matches(path: String): Boolean =
    matchFrom(path.split("/", -1), 0, 0)

  def couldMatch(folder: String): Boolean =
    folder.isEmpty || couldFrom(folder.split("/", -1), 0, 0)

  /** Leading exact directory segments (the basename segment never
    * joins the prefix — it names a file, not a subtree). */
  def staticPrefix: Seq[String] =
    segs.init.iterator.takeWhile(_.isInstanceOf[Exact])
      .map(_.asInstanceOf[Exact].s).toSeq
}

object PathGlob {
  private[sources] sealed trait Segment extends Serializable
  private[sources] case object Globstar extends Segment
  private[sources] final case class Exact(s: String) extends Segment
  private[sources] final case class RegexSeg(p: Pattern) extends Segment

  val Wildcard = "*"
  val RecursiveWildcard = "**"
  def apply(patterns: Seq[String]): PathPredicate =
    if (patterns.size == 1) PathGlob(patterns.head)
    else MultiGlob(patterns.map(PathGlob(_)))
}
