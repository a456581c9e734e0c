package graft.chat

/** Text / retrieval helpers (SURVEY.md §2.6 T1–T4; reference
  * `src/chain.py:58-108`): question normalization, tokenization,
  * token-overlap line retrieval over the schema docs, and the
  * heuristic bullet plan. Pure driver-side logic — the inputs are a
  * question and a (small) markdown document.
  */
object Planner {

  /** T1: trim, collapse whitespace, RU year-shorthand → "year". */
  def normalizeQuestion(q: String): String =
    q.trim.replaceAll("\\s+", " ")
      .replace("г.", "year").replace("года", "year")

  /** T2: `[A-Za-zА-Яа-я0-9_]+` lowercase token stream. */
  def extractTokens(text: String): Seq[String] =
    "[A-Za-zА-Яа-я0-9_]+".r.findAllIn(text.toLowerCase).toSeq

  /** T3: score schema-doc lines by question-token overlap; top-k by
    * (−score, line), each truncated to 120 chars. */
  def similarFields(q: String, schemaDocs: String, topk: Int = 5): Seq[String] = {
    val qTokens = extractTokens(q).toSet
    schemaDocs.linesIterator.flatMap { line =>
      val tokens = extractTokens(line).toSet
      if (tokens.isEmpty) None
      else {
        val score = qTokens.intersect(tokens).size
        if (score > 0) Some((score, line.trim.take(120))) else None
      }
    }.toSeq
      .sortBy { case (score, line) => (-score, line) }
      .take(topk)
      .map(_._2)
  }

  private val TimeKeywords =
    Seq("год", "месяц", "quarter", "year", "month", "дата", "в 202", "за 202")

  /** T4: heuristic bullet plan — goal, matched fields, period-filter
    * hint, output-shape hint. */
  def makePlan(question: String, schemaDocs: String): String = {
    val qn = normalizeQuestion(question)
    val fields = similarFields(qn, schemaDocs, topk = 5)
    val bullets = Seq.newBuilder[String]
    bullets += s"Goal: answer '$question'"
    if (fields.nonEmpty)
      bullets += "Key fields/tables: " + fields.mkString(", ")
    if (TimeKeywords.exists(qn.toLowerCase.contains))
      bullets += "Add a period filter, use ISO dates and BETWEEN y-01-01 AND (y+1)-01-01"
    bullets += "Output: explicit list of columns, reasonable LIMIT"
    bullets.result().mkString(" ; ")
  }
}
