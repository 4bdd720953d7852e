package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification: score each language by counting
  * occurrences of its high-frequency marker words (the n-gram/stopword
  * heuristic every fast lang-id pipeline starts from), pick the argmax with
  * a deterministic tie-break (declaration order). A pure column expression
  * — O(tokens · languages) at scan speed, no shuffle, no UDF — and exactly
  * reproducible in the DuckDB oracle.
  */
object LangId {

  /** (language, marker words). Order is the tie-break priority. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "que", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "von", "ist", "mit", "ein"))

  /** Count of tokens that appear in `markers` (with multiplicity). */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Per-language score columns named `score_<lang>`. */
  def scores(text: Column): Seq[Column] = {
    val toks = split(lower(trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    profiles.map { case (lang, markers) =>
      markerCount(toks, markers).as(s"score_$lang")
    }
  }

  /** Predicted language: argmax of the scores; ties and all-zero rows fall
    * to the earliest language in [[profiles]] ("und" when every score is
    * 0). Built as a fold of `when` clauses — first strictly-greater wins,
    * which equals argmax with declaration-order tie-break. */
  def predicted(text: Column): Column = {
    val toks = split(lower(trim(text)), "[ \\t\\n\\x0B\\f\\r]+")
    val scored = profiles.map { case (lang, m) => lang -> markerCount(toks, m) }
    val best = greatest(scored.map(_._2): _*)
    val allZero = scored.map(_._2 === 0).reduce(_ && _)
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best, lang).otherwise(acc)
    }
    when(allZero, "und").otherwise(pick)
  }

  /** (language, characteristic char trigrams) — the char-n-gram profile
    * variant. Order is the tie-break priority. */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "tio"),
    "es" -> Seq("que", "ión", "ado", "los", "ent"),
    "fr" -> Seq("les", "ent", "ait", "eur", "oux"),
    "de" -> Seq("der", "sch", "ein", "ich", "und"))

  /** Occurrences of a literal substring, via the replace-length identity
    * `(len(s) - len(replace(s, t, ''))) / len(t)` — codegen'd (literal
    * `replace`, no regex), and identical in any SQL engine. */
  def substringCount(text: Column, t: String): Column =
    (length(text) - length(replace(text, lit(t), lit("")))) / t.length

  /** Char-trigram profile score for one language. */
  def trigramScore(lowered: Column, trigrams: Seq[String]): Column =
    trigrams.map(substringCount(lowered, _)).reduce(_ + _)

  /** Predicted language by char-trigram profiles; ties and all-zero rows
    * resolve like [[predicted]] (declaration order / "und"). */
  def predictedByTrigrams(text: Column): Column = {
    val lowered = lower(text)
    val scored = trigramProfiles.map { case (lang, g) => lang -> trigramScore(lowered, g) }
    val best = greatest(scored.map(_._2): _*)
    val allZero = scored.map(_._2 === 0).reduce(_ && _)
    val pick = scored.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best, lang).otherwise(acc)
    }
    when(allZero, "und").otherwise(pick)
  }

  // --- DuckDB oracle mirrors ----------------------------------------------

  private def sqlToks(expr: String): String =
    s"regexp_split_to_array(lower(trim($expr)), '[ \\t\\n\\x0B\\f\\r]+')"

  private def sqlSubstringCount(expr: String, t: String): String = {
    val lit = t.replace("'", "''")
    s"(length($expr) - length(replace($expr, '$lit', ''))) / ${t.length}"
  }

  /** DuckDB mirror of [[predictedByTrigrams]]. */
  def sqlPredictedByTrigrams(expr: String): String = {
    val lowered = s"lower($expr)"
    val scores = trigramProfiles.map { case (lang, g) =>
      lang -> g.map(sqlSubstringCount(lowered, _)).mkString(" + ")
    }
    val best = s"greatest(${scores.map(s => s"(${s._2})").mkString(", ")})"
    val cases = scores.map { case (lang, s) => s"WHEN ($s) = $best THEN '$lang'" }
    s"""CASE WHEN ${scores.map(s => s"(${s._2}) = 0").mkString(" AND ")} THEN 'und'
       |${cases.mkString("\n")}
       |ELSE 'und' END""".stripMargin
  }

  def sqlScore(expr: String, markers: Seq[String]): String = {
    val list = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(${sqlToks(expr)}, t -> list_contains([$list], t)))"
  }

  /** DuckDB mirror of [[predicted]]. */
  def sqlPredicted(expr: String): String = {
    val scores = profiles.map { case (lang, m) => lang -> sqlScore(expr, m) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (lang, s) => s"WHEN $s = $best THEN '$lang'" }
    s"""CASE WHEN ${scores.map(s => s"${s._2} = 0").mkString(" AND ")} THEN 'und'
       |${cases.mkString("\n")}
       |ELSE 'und' END""".stripMargin
  }
}
