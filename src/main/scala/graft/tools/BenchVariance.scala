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
  def main(args: Array[String]): Unit = {
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
