package graft.ksql

/** KSQL → Spark SQL SELECT translation, shared by the batch
  * ([[KsqlEngine]]) and streaming ([[KsqlStreamingEngine]]) executors.
  * Textual and total for the reference dialect: `EMIT CHANGES` stripped,
  * `UCASE`→`upper`, `COUNT_DISTINCT` → engine-chosen aggregate (exact
  * `count(DISTINCT)` in batch, the exact streaming Aggregator in
  * streaming, where Spark rejects count-distinct), `LATEST_BY_OFFSET(x)`
  * → `graft_latest_by_offset(x, stream._offset)`, ksqlDB-style
  * alias-prefixed `SELECT *` expansion.
  *
  * Beyond the tutorial's surface, ksqlDB 0.15's windowed aggregations
  * translate too (engines that carry a `_rowtime` record timestamp):
  * `WINDOW TUMBLING (SIZE n U)` / `HOPPING (SIZE n U, ADVANCE BY m U)` /
  * `SESSION (n U)` become `window()` / `session_window()` grouping
  * expressions, and the `WINDOWSTART`/`WINDOWEND`/`ROWTIME`
  * pseudo-columns resolve to epoch-millis of the window bounds / record
  * time (ksqlDB's BIGINT-millis semantics).
  */
trait KsqlTranslator {

  /** STREAM/TABLE kind of a registered collection, if known. */
  protected def kindOf(name: String): Option[String]

  /** Output columns of a collection (without `_offset`). */
  protected def viewColumns(name: String): Seq[String]

  /** SQL replacement for `COUNT_DISTINCT(` — engine-specific. */
  protected def countDistinctSql: String = "count(DISTINCT "

  /** Whether collection views expose the `_rowtime` record timestamp
    * (required for WINDOW clauses and ROWTIME).
    */
  protected def rowtimeSupported: Boolean = false

  private val FromRe =
    ("(?is)\\bFROM\\s+(\\w+)" +
      "(?:\\s+(?:AS\\s+)?(?!AS\\b|JOIN\\b|LEFT\\b|RIGHT\\b|FULL\\b|INNER\\b|OUTER\\b|ON\\b|WHERE\\b|GROUP\\b|PARTITION\\b|EMIT\\b|HAVING\\b|ORDER\\b|LIMIT\\b|WINDOW\\b)(\\w+))?").r
  private val JoinRe =
    "(?is)\\bJOIN\\s+(\\w+)(?:\\s+(?:AS\\s+)?(?!AS\\b|ON\\b)(\\w+))?\\s+ON\\b".r

  /** (collection name, reference-in-query) pairs from the FROM clause.
    * Parsed over the literal-masked text — `WHERE note = 'copied FROM
    * players'` must not surface a phantom source — and `AS` aliases
    * resolve to the alias, never the keyword.
    */
  private[ksql] def fromSources(select: String): Seq[(String, String)] = {
    val masked = KsqlTranslator.maskLiterals(select)
    val from = FromRe.findFirstMatchIn(masked).map(m =>
      (m.group(1), Option(m.group(2)).getOrElse(m.group(1))))
    val joins = JoinRe.findAllMatchIn(masked).map(m =>
      (m.group(1), Option(m.group(2)).getOrElse(m.group(1)))).toSeq
    from.toSeq ++ joins
  }

  private val WindowRe =
    "(?is)\\bWINDOW\\s+(TUMBLING|HOPPING|SESSION)\\s*\\(([^)]*)\\)".r
  private val SizeRe = "(?i)SIZE\\s+(\\d+)\\s+(\\w+)".r
  private val AdvanceRe = "(?i)ADVANCE\\s+BY\\s+(\\d+)\\s+(\\w+)".r
  private val BareDurRe = "(?i)(\\d+)\\s+(\\w+)".r

  /** The structural WINDOW match, with string literals masked so
    * `WHERE note = 'WINDOW SESSION(x)'` never parses as a window clause.
    * Masking is length-preserving, so match positions index into the
    * ORIGINAL string. [[translateSelect]] and the streaming engine's
    * output-mode decision both go through this — one parse, no
    * regex-vs-translator drift.
    */
  private[ksql] def windowMatch(
      select: String): Option[scala.util.matching.Regex.Match] =
    WindowRe.findFirstMatchIn(KsqlTranslator.maskLiterals(select))

  /** TUMBLING / HOPPING / SESSION, if the select has a WINDOW clause. */
  private[ksql] def windowKind(select: String): Option[String] =
    windowMatch(select).map(_.group(1).toUpperCase)

  private[ksql] def translateSelect(select0: String,
      injectOffset: Boolean = false): String = {
    import KsqlTranslator.replaceOutsideQuotes
    var s = select0.replaceAll("(?is)\\s+EMIT\\s+CHANGES\\s*$", "").trim
    s = replaceOutsideQuotes(s, "(?i)(?<![\\w])COUNT_DISTINCT\\s*\\(",
      java.util.regex.Matcher.quoteReplacement(countDistinctSql))
    KsqlTranslator.FunctionRenames.foreach { case (ksql, sparkFn) =>
      s = replaceOutsideQuotes(s, s"(?i)(?<![\\w])$ksql\\s*\\(", sparkFn + "(")
    }
    // ksqlDB's STRINGTOTIMESTAMP returns BIGINT epoch-millis, not a
    // TIMESTAMP — wrap rather than rename (single-level args only)
    s = replaceOutsideQuotes(s,
      "(?i)(?<![\\w])STRINGTOTIMESTAMP\\s*\\(([^()]*)\\)",
      "unix_millis(to_timestamp($1))")
    // ---- windowed aggregation (WINDOW TUMBLING/HOPPING/SESSION) --------
    windowMatch(s).foreach { m =>
      require(rowtimeSupported,
        "WINDOW clauses need an engine with record timestamps (_rowtime)")
      val ref = fromSources(s).headOption.map(_._2).getOrElse(
        throw new IllegalArgumentException(s"WINDOW without FROM: $select0"))
      def dur(n: String, u: String) = s"$n ${u.toLowerCase}"
      val (winExpr, winCol) = m.group(1).toUpperCase match {
        case "TUMBLING" =>
          val sm = SizeRe.findFirstMatchIn(m.group(2)).getOrElse(
            throw new IllegalArgumentException(s"TUMBLING needs SIZE: $select0"))
          (s"window($ref._rowtime, '${dur(sm.group(1), sm.group(2))}')", "window")
        case "HOPPING" =>
          val sm = SizeRe.findFirstMatchIn(m.group(2)).getOrElse(
            throw new IllegalArgumentException(s"HOPPING needs SIZE: $select0"))
          val am = AdvanceRe.findFirstMatchIn(m.group(2)).getOrElse(
            throw new IllegalArgumentException(s"HOPPING needs ADVANCE BY: $select0"))
          (s"window($ref._rowtime, '${dur(sm.group(1), sm.group(2))}', " +
            s"'${dur(am.group(1), am.group(2))}')", "window")
        case _ => // SESSION
          val gm = BareDurRe.findFirstMatchIn(m.group(2)).getOrElse(
            throw new IllegalArgumentException(s"SESSION needs a gap: $select0"))
          (s"session_window($ref._rowtime, '${dur(gm.group(1), gm.group(2))}')",
            "session_window")
      }
      // positional splice (mask is length-preserving): a literal
      // containing 'WINDOW …' earlier in the text must not be the one cut
      s = s.substring(0, m.start) + " " + s.substring(m.end)
      // find GROUP BY on the RE-masked text (a literal containing
      // 'group by' before the real clause must not take the splice),
      // then splice positionally into the original
      val gbm = "(?i)\\bGROUP\\s+BY\\b".r
        .findFirstMatchIn(KsqlTranslator.maskLiterals(s))
        .getOrElse(throw new IllegalArgumentException(
          s"WINDOW clauses require GROUP BY (windowed aggregation): $select0"))
      s = s.substring(0, gbm.start) + s"GROUP BY $winExpr," +
        s.substring(gbm.end)
      s = replaceOutsideQuotes(s, "(?i)(?<![\\w])WINDOWSTART(?![\\w])",
        s"unix_millis($winCol.start)")
      s = replaceOutsideQuotes(s, "(?i)(?<![\\w])WINDOWEND(?![\\w])",
        s"unix_millis($winCol.end)")
    }
    if (rowtimeSupported && s.toUpperCase.matches("(?s).*(?<![\\w])ROWTIME(?![\\w]).*")) {
      val ref = fromSources(s).headOption.map(_._2).getOrElse("")
      s = replaceOutsideQuotes(s, "(?i)(?<![\\w])ROWTIME(?![\\w])",
        s"unix_millis($ref._rowtime)")
    }
    val sources = fromSources(s)
    // LATEST_BY_OFFSET orders by the STREAM side's record offset
    if (s.toUpperCase.contains("LATEST_BY_OFFSET")) {
      val streamRef = sources
        .collectFirst { case (n, ref) if kindOf(n).contains("STREAM") => ref }
        .orElse(sources.headOption.map(_._2))
        .getOrElse(throw new IllegalArgumentException(
          s"LATEST_BY_OFFSET without a FROM source: $select0"))
      s = KsqlTranslator.replaceOutsideQuotes(s,
        "(?i)LATEST_BY_OFFSET\\s*\\(([^()]*)\\)",
        s"graft_latest_by_offset($$1, $streamRef._offset)")
    }
    // SELECT * expansion: single source -> declared columns; join -> each
    // side's columns prefixed with its reference (ksqlDB output naming)
    if (s.matches("(?is)^SELECT\\s+\\*\\s+FROM\\b.*")) {
      val cols = sources match {
        case Seq((name, ref)) =>
          viewColumns(name).map(c => s"$ref.$c AS $c")
        case multi => multi.flatMap { case (name, ref) =>
          viewColumns(name).map(c => s"$ref.$c AS ${ref}_$c") }
      }
      s = s.replaceFirst("(?is)^SELECT\\s+\\*", "SELECT " + cols.mkString(", "))
    }
    if (injectOffset && !s.toUpperCase.contains("GROUP BY")) {
      // derived streams carry the source offset through (Kafka offset
      // analogue) so downstream LATEST_BY_OFFSET keeps arrival order —
      // and the record timestamp, so downstream WINDOW clauses still work
      val ref = sources.headOption.map(_._2).getOrElse("")
      val extra = s", $ref._offset AS _offset " +
        (if (rowtimeSupported) s", $ref._rowtime AS _rowtime " else "")
      s = FromRe.replaceFirstIn(s,
        java.util.regex.Matcher.quoteReplacement(extra) + "FROM $1 $2")
    }
    s
  }
}

object KsqlTranslator {
  /** ksqlDB scalar-function names whose Spark spelling differs; everything
    * else (ABS, ROUND, CONCAT, TRIM, SUBSTRING, REPLACE, INSTR, SPLIT,
    * CASE, CAST, …) is shared SQL that Catalyst parses directly.
    */
  private[ksql] val FunctionRenames: Seq[(String, String)] = Seq(
    "UCASE" -> "upper",
    "LCASE" -> "lower",
    "LEN" -> "length",
    "ARRAY_LENGTH" -> "size",
    "ARRAY_CONTAINS" -> "array_contains",
    "ARRAY_DISTINCT" -> "array_distinct",
    "ARRAY_MAX" -> "array_max",
    "ARRAY_MIN" -> "array_min",
    "ARRAY_JOIN" -> "array_join",
    "JSON_EXTRACT_STRING" -> "get_json_object",
    "IFNULL" -> "coalesce")

  /** Apply a regex replacement only OUTSIDE single-quoted string
    * literals — token rewrites must never touch literal text
    * (`WHERE note = 'LEN(x)'` keeps its literal).
    */
  private[ksql] def replaceOutsideQuotes(s: String, regex: String,
      replacement: String): String = {
    val out = new StringBuilder
    val cur = new StringBuilder
    var inQuote = false
    def flush(): Unit = {
      if (cur.nonEmpty) {
        out.append(
          if (inQuote) cur.result()
          else cur.result().replaceAll(regex, replacement))
        cur.clear()
      }
    }
    s.foreach { c =>
      if (c == '\'') {
        if (inQuote) { cur.append(c); flush(); inQuote = false }
        else { flush(); inQuote = true; cur.append(c) }
      } else cur.append(c)
    }
    flush()
    out.result()
  }

  /** Replace every single-quoted literal's content (quotes included) with
    * spaces — length-preserving, so regex match positions computed on the
    * masked text index into the original. Structural parses (WINDOW
    * clauses) match against this, never against literal text.
    */
  private[ksql] def maskLiterals(s: String): String = {
    val out = new StringBuilder(s.length)
    var inQuote = false
    s.foreach { c =>
      if (c == '\'') { inQuote = !inQuote; out.append(' ') }
      else out.append(if (inQuote) ' ' else c)
    }
    out.result()
  }
}
