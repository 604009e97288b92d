package graft.tools

/** Post-hoc variance report over a `bench_full.json` artifact.
  *
  * Round 10's official bench artifact was load-poisoned 2.2× (both
  * back-to-back samples of several queries landed inside one sustained
  * container-load window) and adjudicating it required re-running the
  * engine. This report lets a reader adjudicate from the artifact
  * alone: for every query it prints the max/min sample ratio and flags
  * spreads above a threshold (default 3×) as likely load windows.
  * With the pass-structured Bench (round 11+), a flagged query means
  * "one pass was poisoned; the min is trustworthy"; MANY flagged
  * queries clustered in sample position means "a whole pass was
  * poisoned; read the other pass".
  *
  * Usage: runMain graft.tools.BenchVariance [bench_full.json] [ratioThreshold]
  *
  * No Spark session — it's a pure JSON reader (regex-extracted; the
  * artifact is machine-written with a fixed shape, see Bench.scala).
  */
object BenchVariance {

  /** Cross-run mode: `runMain graft.tools.BenchVariance
    * bench_history.jsonl history` — a calibration-CLEAN run can still
    * sit 20-25% above another clean run under uniform ambient load
    * (invisible to a within-run kernel, which self-normalizes to the
    * run's own best; r14 measured 167.2 vs 207.3 s same-code). The
    * honest cross-run statistic is per-query MIN over runs; this mode
    * prints it plus the latest run's regressions against it (queries
    * whose latest min-of-clean exceeds the cross-run min by the
    * threshold — real-regression candidates once ambient load is
    * ruled out).
    */
  private def historyReport(path: String, threshold: Double): Unit = {
    val lines = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.getLines().toVector finally src.close()
    }.filter(_.nonEmpty)
    require(lines.nonEmpty, s"no runs in $path")
    val entry = """"([^"]+)":(-?[0-9.]+)""".r
    val sfRe = """"sf":"([^"]*)"""".r
    def qmap(line: String): Map[String, Double] = {
      val key = "\"queries\":{"
      val i = line.indexOf(key)
      require(i >= 0, "line without queries map")
      val body = line.substring(i + key.length, line.indexOf("}", i))
      entry.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble)
        // failed queries are appended NEGATED (Bench's sentinel) —
        // they are not timings and must not become cross-run minima
        .filter(_._2 > 0)
        .toMap
    }
    def sfOf(line: String): String =
      sfRe.findFirstMatchIn(line).map(_.group(1)).getOrElse("")
    // minima are only comparable at one scale factor: restrict the
    // report to runs matching the LATEST line's sf (a dev sf0.01 run
    // in the file must not become every sf0.1 query's "min")
    val latestSf = sfOf(lines.last)
    val runs = lines.filter(sfOf(_) == latestSf).map(qmap)
    val latest = runs.last
    val minOver = runs.flatMap(_.toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).min }
    println(f"bench history: ${runs.size} runs at sf '$latestSf' in $path" +
      (if (runs.size != lines.size)
        f" (${lines.size - runs.size} other-sf runs excluded)" else ""))
    println(f"  latest total ${latest.values.sum}%.1f s   " +
      f"cross-run min-total ${latest.keys.map(minOver).sum}%.1f s " +
      "(over the latest run's query set)")
    val regs = latest.toSeq
      .filter { case (k, v) => minOver(k) > 0 && v / minOver(k) > threshold }
      .sortBy { case (k, v) => -(v - minOver(k)) }
    if (regs.isEmpty)
      println(f"  no query exceeds ${threshold}%.2fx its cross-run min")
    else regs.take(20).foreach { case (k, v) =>
      println(f"  $k%-28s latest $v%7.2f s  vs cross-run min " +
        f"${minOver(k)}%7.2f s  (${v / minOver(k)}%.2fx)")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("history")) {
      // all spellings work: `history`, `history 2.0`,
      // `<file> history [threshold]`
      val rest = args.filterNot(_ == "history").toList
      val (file, thr) = rest match {
        case Nil => ("bench_history.jsonl", 1.5)
        case h :: _ if scala.util.Try(h.toDouble).isSuccess =>
          ("bench_history.jsonl", h.toDouble)
        case h :: t =>
          (h, t.headOption.flatMap(x =>
            scala.util.Try(x.toDouble).toOption).getOrElse(1.5))
      }
      historyReport(file, thr)
      return
    }
    val path = args.headOption.getOrElse("bench_full.json")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(3.0)
    val text = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.mkString finally src.close()
    }
    // "samples":{"name":[1.0,2.0],...} — machine-written, no nesting
    // inside the array values, names never contain quotes.
    val samplesBlock = {
      val key = "\"samples\":{"
      val i = text.indexOf(key)
      require(i >= 0, s"no samples map in $path")
      val start = i + key.length
      val end = text.indexOf("}", start)
      text.substring(start, end)
    }
    val entry = """"([^"]+)":\[([^\]]*)\]""".r
    val rows = entry.findAllMatchIn(samplesBlock).map { m =>
      val name = m.group(1)
      val ss = m.group(2).split(',').filter(_.nonEmpty).map(_.toDouble.abs).toSeq
      (name, ss)
    }.toSeq
    require(rows.nonEmpty, s"no per-query samples parsed from $path")

    val stats = rows.map { case (name, ss) =>
      val ratio = if (ss.min > 0) ss.max / ss.min else Double.PositiveInfinity
      (name, ss, ratio)
    }
    val flagged = stats.filter(_._3 > threshold).sortBy(-_._3)

    println(f"bench variance report: $path  (${rows.size} queries, flag ratio > $threshold%.1f)")
    println(f"  suite min-total: ${stats.map(_._2.min).sum}%.1f s   " +
      f"worst-sample total: ${stats.map(_._2.max).sum}%.1f s")
    // Per-pass sums: with pass-structured sampling, sample i of every
    // query belongs to pass i (remeasure samples beyond the common
    // prefix are excluded). A poisoned pass shows as one outlier sum.
    val nPasses = stats.map(_._2.size).min
    (0 until nPasses).foreach { p =>
      val sum = stats.map(_._2(p)).sum
      println(f"  pass ${p + 1} total: $sum%.1f s")
    }
    // Calibration self-declaration (round 12+ artifacts): the bench's
    // own load index — print it so the one-file adjudication includes
    // the measured window quality, not just inferred spread.
    val calibKey = "\"samples_pass_at_sec\":["
    val ci = text.indexOf(calibKey)
    if (ci >= 0) {
      val end = text.indexOf("]]", ci)
      val triple = """\[(-?\d+),(-?\d+),([0-9.]+)\]""".r
      val cs = triple.findAllMatchIn(text.substring(ci, end + 2))
        .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toDouble))
        .toSeq
      if (cs.nonEmpty) {
        val base = cs.map(_._3).min
        val loaded = cs.groupBy(_._1).collect {
          case (p, ss) if ss.exists(_._3 > 2.0 * base) => p
        }.toSeq.sorted
        println(f"  calibration kernel: baseline ${base}%.3f s, " +
          f"max ${cs.map(_._3).max}%.3f s over ${cs.size} samples; " +
          (if (loaded.isEmpty) "no pass flagged loaded"
           else s"passes flagged loaded: ${loaded.mkString(", ")}"))
      }
    } else
      println("  (no calibration section — pre-round-12 artifact)")
    if (flagged.isEmpty)
      println(f"  no query spread exceeds ${threshold}%.1f x — artifact looks clean")
    else {
      println(s"  ${flagged.size} queries exceed the spread threshold (likely load windows; min remains trustworthy):")
      flagged.foreach { case (name, ss, ratio) =>
        println(f"    $name%-28s ratio ${ratio}%6.2fx  samples [${ss.map(v => f"$v%.2f").mkString(", ")}]")
      }
    }
  }
}
