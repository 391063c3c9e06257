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

  /** Render a `COUNT_DISTINCT(args)` call — engine-specific (batch uses
    * native count-distinct; streaming substitutes the exact Aggregator,
    * which Spark's unsupported-operation check requires).
    */
  protected def countDistinctRender(args: String): String =
    s"count(DISTINCT $args)"

  /** The select text of a derived (CSAS/CTAS) view, if `name` is one —
    * the lookup [[effectiveWindowKind]] recurses through.
    */
  protected def derivedSelect(name: String): Option[String] = None

  /** The WINDOW kind a query effectively runs under: its own clause, or
    * one inherited from a derived (CSAS/CTAS) view it reads —
    * `CREATE TABLE s AS SELECT … WINDOW SESSION(…) …; SELECT * FROM s`
    * is a session-windowed aggregation even though the outer text has no
    * WINDOW. Recurses through derived-of-derived; cycles cut by `seen`.
    * ONE implementation on the shared trait: both planes must give the
    * same verdict on the same statement, which two copy-pasted bodies
    * can only promise until one is edited.
    */
  private[ksql] def effectiveWindowKind(select: String,
      seen: Set[String] = Set.empty): Option[String] =
    windowKind(select).orElse(
      fromSources(select).iterator
        .map(_._1.toLowerCase).filterNot(seen)
        .flatMap(n => derivedSelect(n)
          .flatMap(sel => effectiveWindowKind(sel, seen + n)))
        .nextOption())

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
    import KsqlTranslator.{replaceOutsideQuotes, rewriteCall}
    var s = select0.replaceAll("(?is)\\s+EMIT\\s+CHANGES\\s*$", "").trim
    // depth-matched call rewrite, not a [^()]* regex: COUNT_DISTINCT's
    // argument may itself contain calls (ABS(v)), and the streaming
    // render needs the whole argument inside a CAST — a paren-blind
    // pattern either misses the call (leaving count(DISTINCT …), which
    // Spark rejects under streaming aggregation) or cuts the argument
    s = rewriteCall(s, "COUNT_DISTINCT", countDistinctRender)
    KsqlTranslator.FunctionRenames.foreach { case (ksql, sparkFn) =>
      s = replaceOutsideQuotes(s, s"(?i)(?<![\\w])$ksql\\s*\\(", sparkFn + "(")
    }
    // ksqlDB's STRINGTOTIMESTAMP returns BIGINT epoch-millis, not a
    // TIMESTAMP — wrap rather than rename. Depth-matched: the standard
    // two-arg form carries a QUOTED format string, which a
    // segment-by-quote regex rewrite can never cross (the call used to
    // survive untranslated whenever a format argument was present)
    s = rewriteCall(s, "STRINGTOTIMESTAMP",
      args => s"unix_millis(to_timestamp($args))")
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
      s = KsqlTranslator.rewriteCall(s, "LATEST_BY_OFFSET",
        args => s"graft_latest_by_offset($args, $streamRef._offset)")
    }
    // Star expansion, ITEM-WISE over the select list (ksqlDB output
    // naming): `*` and `ref.*` items expand to declared columns — a
    // whole-text `^SELECT \* FROM` match would leave `SELECT *, expr`
    // and `SELECT a.*` to Spark's native star, which expands against
    // the registered views and leaks the internal _offset/_rowtime
    // columns into client-visible results
    locally {
      val masked = KsqlTranslator.maskLiterals(s)
      val selRe = "(?is)^SELECT\\s+".r
      for (sm <- selRe.findPrefixMatchOf(masked);
           fm <- FromRe.findFirstMatchIn(masked)) {
        def expandAll: Seq[String] = sources match {
          case Seq((name, ref)) => viewColumns(name).map(c => s"$ref.$c AS $c")
          case multi => multi.flatMap { case (name, ref) =>
            viewColumns(name).map(c => s"$ref.$c AS ${ref}_$c") }
        }
        def expandRef(r: String): Option[Seq[String]] =
          sources.collectFirst { case (name, ref)
              if ref.equalsIgnoreCase(r) =>
            if (sources.sizeIs == 1) viewColumns(name).map(c => s"$ref.$c AS $c")
            else viewColumns(name).map(c => s"$ref.$c AS ${ref}_$c")
          }
        // split the select list at depth-0 commas of the MASKED text so
        // literal/paren commas never split an item; spans index into s
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var depth = 0
        var start = sm.end
        (sm.end until fm.start).foreach { i =>
          masked.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 0 => spans += ((start, i)); start = i + 1
            case _ => ()
          }
        }
        spans += ((start, fm.start))
        val starRe = "^(?:(\\w+)\\.)?\\*$".r
        var expanded = false
        val items = spans.map { case (a, b) =>
          val item = s.substring(a, b).trim
          starRe.findFirstMatchIn(item) match {
            case Some(m) if m.group(1) == null =>
              expanded = true; expandAll.mkString(", ")
            case Some(m) => expandRef(m.group(1)) match {
              case Some(cols) => expanded = true; cols.mkString(", ")
              case None => item
            }
            case None => item
          }
        }
        if (expanded)
          s = s.substring(0, sm.end) + items.mkString(", ") + " " +
            s.substring(fm.start)
      }
    }
    // GROUP BY detection and the FROM splice both run on the MASKED
    // text: a literal 'GROUP BY' must not suppress injection, a literal
    // 'FROM x' must not take the splice (positions index into the
    // original because masking is length-preserving)
    if (injectOffset && "(?i)\\bGROUP\\s+BY\\b".r
        .findFirstIn(KsqlTranslator.maskLiterals(s)).isEmpty) {
      // derived streams carry the source offset through (Kafka offset
      // analogue) so downstream LATEST_BY_OFFSET keeps arrival order —
      // and the record timestamp, so downstream WINDOW clauses still work
      val ref = sources.headOption.map(_._2).getOrElse("")
      val extra = s", $ref._offset AS _offset " +
        (if (rowtimeSupported) s", $ref._rowtime AS _rowtime " else "")
      FromRe.findFirstMatchIn(KsqlTranslator.maskLiterals(s)).foreach { fm =>
        s = s.substring(0, fm.start) + extra + s.substring(fm.start)
      }
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

  /** Rewrite every `fn(args)` call via a depth-matched argument scan on
    * the literal-masked text: the call's parens are found structurally
    * (literal parens don't count, nested calls don't cut the argument),
    * and `render` receives the RAW argument text verbatim — so a quoted
    * format string or a nested function survives, which the
    * segment-by-quote regex rewrites cannot promise (they never see a
    * pattern spanning a literal). Unbalanced parens leave the text
    * untouched for Spark's parser to report. Rescans from just past each
    * rewritten call head so calls nested inside arguments rewrite too.
    */
  private[ksql] def rewriteCall(s0: String, fn: String,
      render: String => String): String = {
    val headRe = s"(?i)(?<![\\w])${java.util.regex.Pattern.quote(fn)}\\s*\\(".r
    var s = s0
    var from = 0
    var continue = true
    while (continue) {
      val masked = maskLiterals(s)
      headRe.findFirstMatchIn(masked.substring(from)) match {
        case None => continue = false
        case Some(m) =>
          val open = from + m.end - 1
          var i = open + 1
          var depth = 1
          while (i < masked.length && depth > 0) {
            masked.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ => ()
            }
            if (depth > 0) i += 1
          }
          if (depth != 0) continue = false // unbalanced: leave as-is
          else {
            val args = s.substring(open + 1, i)
            s = s.substring(0, from + m.start) + render(args) +
              s.substring(i + 1)
            from = from + m.start + 1
          }
      }
    }
    s
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
