package graft.core

/** Report rendering (reference: term-guard/src/formatters.rs): human text and JSON. */
object Formatters {

  def text(report: ValidationReport): String = {
    val sb = new StringBuilder
    sb.append(s"Validation suite: ${report.suiteName} — ")
      .append(if (report.isSuccess) "PASSED" else "FAILED").append('\n')
    sb.append(s"  constraints: ${report.metrics.totalConstraints}  " +
      s"passed: ${report.metrics.passed}  failed: ${report.metrics.failed}  " +
      s"skipped: ${report.metrics.skipped}  (${report.metrics.durationMillis} ms)\n")
    report.checkResults.foreach { cr =>
      sb.append(s"  [${cr.check.level}] ${cr.check.description}: ")
        .append(if (cr.passed) "ok" else "FAILED").append('\n')
      cr.constraintResults.foreach { r =>
        val mark = r.status match {
          case ConstraintStatus.Success => "+"
          case ConstraintStatus.Failure => "x"
          case ConstraintStatus.Skipped => "-"
        }
        sb.append(s"    $mark ${r.constraint}")
        // Locale.ROOT: the f interpolator uses the JVM default locale, which renders
        // decimal COMMAS on e.g. de_DE deployments — same report, different bytes.
        r.metric.flatMap(_.asDouble).foreach(v =>
          sb.append(String.format(java.util.Locale.ROOT, " = %.6g", Double.box(v))))
        sb.append(s" [${r.durationMillis} ms]")
        if (r.message.nonEmpty) sb.append(s"  (${r.message})")
        sb.append('\n')
      }
    }
    sb.toString
  }

  def json(report: ValidationReport): String = {
    def q(s: String) = JsonStr.quote(s)
    // Every double goes through this: bare NaN/Infinity is not valid JSON and one
    // non-finite value anywhere (vector element, histogram ratio) would make the whole
    // report unparseable.
    def num(v: Double): String = if (v.isNaN || v.isInfinite) "null" else v.toString
    def metricJson(m: MetricValue): String = m match {
      case MetricValue.DoubleMetric(v) => num(v)
      case MetricValue.LongMetric(v) => v.toString
      case MetricValue.StringMetric(v) => q(v)
      case MetricValue.BooleanMetric(v) => v.toString
      case MetricValue.VectorMetric(v) => v.map(num).mkString("[", ",", "]")
      case MetricValue.HistogramMetric(h) =>
        // total/distinct/null counts travel alongside the buckets: bucket counts need
        // not sum to total (nulls, truncation), so a JSON consumer cannot derive them.
        // Secondary key sort: count ties would otherwise serialize in Map iteration
        // order — same report, different bytes across JVM/Scala versions.
        val buckets = h.buckets.toSeq.sortBy(b => (-b._2.count, b._1)).map { case (k, b) =>
          s"${q(k)}:{" + s""""count":${b.count},"ratio":${num(b.ratio)}}""" }
          .mkString("{", ",", "}")
        s"""{"total":${h.total},"distinct":${h.distinctCount},"nulls":${h.nullCount},""" +
          s""""buckets":$buckets}"""
      case MetricValue.MapMetric(m2) =>
        m2.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:${metricJson(v)}" }
          .mkString("{", ",", "}")
    }
    val checks = report.checkResults.map { cr =>
      val rs = cr.constraintResults.map { r =>
        s"""{"constraint":${q(r.constraint)},"status":${q(r.status.toString)},""" +
          s""""metric":${r.metric.map(metricJson).getOrElse("null")},"message":${q(r.message)},""" +
          s""""duration_ms":${r.durationMillis}}"""
      }.mkString("[", ",", "]")
      s"""{"check":${q(cr.check.description)},"level":${q(cr.check.level.toString)},""" +
        s""""passed":${cr.passed},"results":$rs}"""
    }.mkString("[", ",", "]")
    val issues = report.issues.map { i =>
      s"""{"check":${q(i.check)},"level":${q(i.level.toString)},""" +
        s""""constraint":${q(i.constraint)},"message":${q(i.message)}}"""
    }.mkString("[", ",", "]")
    s"""{"suite":${q(report.suiteName)},"success":${report.isSuccess},""" +
      s""""metrics":{"total":${report.metrics.totalConstraints},"passed":${report.metrics.passed},""" +
      s""""failed":${report.metrics.failed},"skipped":${report.metrics.skipped},""" +
      s""""duration_ms":${report.metrics.durationMillis}},"checks":$checks,"issues":$issues}"""
  }
}
