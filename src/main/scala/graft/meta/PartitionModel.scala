package graft.meta

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, ZoneOffset}

import Model._

/** Partition-spec expansion, value normalization and rendering — the
  * reference's subtlest pure logic (SURVEY.md §2.8 F1-F9, §7.4 #3-4).
  *
  * Reference behavior reproduced exactly:
  *  - spec expansion: backend/internal/iceberg_client.go:422-496 — hidden
  *    time transforms expand (day→year,month,day; month→year,month;
  *    year→year); identity keeps the (possibly dotted) source column name;
  *    bucket/truncate are rejected as errors (iceberg_client.go:469).
  *  - date normalization: Iceberg Date = days since epoch → zero-padded
  *    y/m/d strings (iceberg_client.go:292-310; day 20164 → 2025-03-17,
  *    iceberg_client_test.go:44-46).
  *  - PartitionValues → date: require year+month+day, trim leading zeros,
  *    int-cast, UTC date (types_iceberg.go:73-123).
  *  - hidden filter → raw literal: day → "y-m-d", month → "y-m-01",
  *    year → "y-01-01" (service_browse_files.go:144-182).
  *  - canonical partition string: sorted `{k=v, …}`, null → "null",
  *    empty → "unpartitioned" (types_iceberg.go:62-71,
  *    iceberg_client.go:223-240, service_browse_files.go:261-347).
  */
object PartitionModel {

  final case class SpecField(name: String, transform: String, sourceColumn: String)

  /** Expand a raw partition spec into logical partition fields. */
  def expandSpec(fields: Seq[SpecField]): Either[String, Seq[PartitionField]] = {
    val out = Seq.newBuilder[PartitionField]
    for (f <- fields) {
      f.transform match {
        case "identity" =>
          // name = (possibly dotted) source column; raw field name = the
          // spec field's own name (iceberg_client_test.go:72-89).
          out += PartitionField(f.sourceColumn, f.name, isHidden = false, None)
        case "day" =>
          for (n <- Seq("year", "month", "day"))
            out += PartitionField(n, f.name, isHidden = true,
              Some(HiddenTransform(f.sourceColumn, "day")))
        case "month" =>
          for (n <- Seq("year", "month"))
            out += PartitionField(n, f.name, isHidden = true,
              Some(HiddenTransform(f.sourceColumn, "month")))
        case "year" =>
          out += PartitionField("year", f.name, isHidden = true,
            Some(HiddenTransform(f.sourceColumn, "year")))
        case other =>
          return Left(s"unsupported partition transform: $other")
      }
    }
    Right(out.result())
  }

  /** Normalize a raw day-transform value (days since epoch) into the
    * expanded y/m/d string fields. Zero-padded like Go's "2006"/"01"/"02". */
  def normalizeDayValue(daysSinceEpoch: Int, transform: String): Map[String, String] = {
    val d = LocalDate.ofEpochDay(daysSinceEpoch.toLong)
    transform match {
      case "day" => Map(
        "year" -> f"${d.getYear}%04d",
        "month" -> f"${d.getMonthValue}%02d",
        "day" -> f"${d.getDayOfMonth}%02d")
      case "month" => Map(
        "year" -> f"${d.getYear}%04d",
        "month" -> f"${d.getMonthValue}%02d")
      case "year" => Map("year" -> f"${d.getYear}%04d")
      case other => throw new IllegalArgumentException(s"not a time transform: $other")
    }
  }

  /** PartitionValues → UTC date; None when no date-bearing keys are
    * present (types_iceberg.go:73-123). Understands BOTH layouts the
    * engine produces: a flat `date=YYYY-MM-DD` key (compaction
    * manifests — without this branch the optimize planner silently
    * skipped every flagged date-keyed partition) and the expanded
    * year/month/day keys, with mixed zero-padding ("6" == "06"). */
  def partitionDate(values: Map[String, String]): Option[LocalDate] = {
    def intOf(key: String): Option[Int] =
      values.get(key).flatMap { raw =>
        val t = raw.dropWhile(_ == '0')
        val s = if (t.isEmpty && raw.nonEmpty) "0" else t
        scala.util.Try(s.toInt).toOption
      }
    val flat = values.get("date")
      .flatMap(s => scala.util.Try(LocalDate.parse(s)).toOption)
    flat.orElse(for {
      y <- intOf("year"); m <- intOf("month"); d <- intOf("day")
      date <- scala.util.Try(LocalDate.of(y, m, d)).toOption
    } yield date)
  }

  /** Hidden time filter → raw partition literal
    * (service_browse_files.go:144-182). */
  def hiddenFilterLiteral(transform: String, year: String, month: String, day: String): Either[String, String] = {
    def pad2(s: String) = if (s.length >= 2) s else "0" * (2 - s.length) + s
    transform match {
      case "day" => Right(s"$year-${pad2(month)}-${pad2(day)}")
      case "month" => Right(s"$year-${pad2(month)}-01")
      case "year" => Right(s"$year-01-01")
      case other => Left(s"unsupported hidden transform: $other")
    }
  }

  /** Resolve browse-filter selections against an expanded spec
    * (handler_browse.go + handler_browse_test.go:9-67): every provided key
    * must name a spec field; hidden fields for the same raw field collapse
    * into one (rawField, literal) selection; identity fields pass through.
    * Selection must be complete per raw field (year+month+day for a day
    * transform). */
  def resolveSelections(
      spec: Seq[PartitionField],
      filters: Map[String, String]): Either[String, Seq[(String, String)]] = {
    val byName = spec.map(f => f.name -> f).toMap
    val unknown = filters.keySet -- byName.keySet
    if (unknown.nonEmpty) return Left(s"unknown partition key(s): ${unknown.toSeq.sorted.mkString(",")}")

    // group hidden fields by raw field, in spec order
    val rawOrder = spec.map(_.rawFieldName).distinct
    val out = Seq.newBuilder[(String, String)]
    for (raw <- rawOrder) {
      val group = spec.filter(_.rawFieldName == raw)
      val provided = group.filter(f => filters.contains(f.name))
      if (provided.nonEmpty) {
        if (provided.size != group.size)
          return Left(s"incomplete selection for partition field $raw")
        val head = group.head
        if (head.isHidden) {
          val t = head.hidden.map(_.`type`).getOrElse("")
          val lit = hiddenFilterLiteral(t,
            filters.getOrElse("year", ""),
            filters.getOrElse("month", ""),
            filters.getOrElse("day", "")) match {
            case Right(v) => v
            case Left(e) => return Left(e)
          }
          out += raw -> lit
        } else {
          out += raw -> filters(head.name)
        }
      }
    }
    Right(out.result())
  }

  /** Files-browse selection resolution — unlike [[resolveSelections]],
    * a COMPLETE selection is required (every spec field filtered), with
    * the reference's exact validation order and messages
    * (service_browse_files.go:83-142): no spec → error; any unknown
    * filter key → error; filter count must equal field count; hidden
    * fields collapse per raw field into one literal; a field without
    * raw-field metadata is a hard error. Returns (rawFieldName, value)
    * pairs in spec order. */
  def resolveCompleteSelections(
      spec: Seq[PartitionField],
      filters: Map[String, String]): Either[String, Seq[(String, String)]] = {
    if (spec.isEmpty) return Left("table does not define any partitions")
    val valid = spec.map(_.name).toSet
    filters.keys.find(!valid(_)) match {
      case Some(k) => return Left(s"""unknown partition key "$k"""")
      case None =>
    }
    if (filters.size != spec.size)
      return Left("listing data files requires a complete partition selection")
    val out = Seq.newBuilder[(String, String)]
    val seenRaw = scala.collection.mutable.Set.empty[String]
    for (field <- spec) {
      if (field.rawFieldName == null || field.rawFieldName.isEmpty)
        return Left(s"""partition "${field.name}" is missing raw field metadata""")
      if (!seenRaw(field.rawFieldName)) {
        seenRaw += field.rawFieldName
        if (field.isHidden) {
          def req(key: String): Either[String, String] =
            filters.get(key).filter(_.nonEmpty)
              .toRight(s"""missing partition filter "$key"""")
          val t = field.hidden.map(_.`type`).getOrElse("")
          val lit =
            if (!Set("day", "month", "year").contains(t))
              Left(s"unsupported hidden transform: $t")
            else for {
              y <- req("year")
              m <- if (t == "year") Right("") else req("month")
              d <- if (t == "day") req("day") else Right("")
              v <- hiddenFilterLiteral(t, y, m, d)
            } yield v
          lit match {
            case Right(v) => out += field.rawFieldName -> v
            case Left(e) => return Left(e)
          }
        } else filters.get(field.name) match {
          case Some(v) => out += field.rawFieldName -> v
          case None => return Left(s"""missing partition filter "${field.name}"""")
        }
      }
    }
    Right(out.result())
  }

  /** Canonical partition-key string (sorted keys); empty map renders as
    * "unpartitioned" (iceberg_client.go:223-226); null values as "null". */
  def canonicalString(values: Map[String, String]): String =
    if (values.isEmpty) "unpartitioned"
    else values.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${Option(v).getOrElse("null")}" }
      .mkString("{", ", ", "}")

  /** F9 browse rendering (service_browse_files.go:300-333): the
    * *selected* partition-field names render first, in selection order
    * (skipping selected names absent from the value map), then the
    * remaining keys alphabetically. Null values render as "null"
    * (formatBrowsePartitionValue, go:336-341). */
  def renderOrdered(values: Map[String, String], selectedOrder: Seq[String]): String =
    browseKeyOrder(values.keySet, selectedOrder)
      .map(k => s"$k=${Option(values(k)).getOrElse("null")}")
      .mkString("{", ", ", "}")

  /** The F9 key ordering alone: selected names first (selection order,
    * present-only), remaining alphabetical — shared by the scalar
    * renderer above and the column-expression browse queries, so the
    * ordering rule lives in exactly one place. */
  def browseKeyOrder(allKeys: Set[String], selectedOrder: Seq[String]): Seq[String] = {
    val selected = selectedOrder.filter(allKeys.contains).distinct
    selected ++ (allKeys -- selected).toSeq.sorted
  }

  /** F9 tuple rendering (formatBrowsePartitionTuple,
    * service_browse_files.go:280-298): positional values labeled with
    * the partition-field name at the same index, `field_<i>` when the
    * name is missing or blank. */
  def renderTuple(values: Seq[String], fieldNames: Seq[String]): String =
    values.zipWithIndex.map { case (v, i) =>
      val name =
        if (i < fieldNames.length && fieldNames(i).nonEmpty) fieldNames(i)
        else s"field_$i"
      s"$name=${Option(v).getOrElse("null")}"
    }.mkString("{", ", ", "}")

  private val rfc3339 = DateTimeFormatter.ISO_OFFSET_DATE_TIME

  /** F11 dual-format datetime parse (datetime.go:26-75): date-only →
    * UTC midnight; RFC3339 accepted; null/empty → None. */
  def parseDateTime(s: String): Either[String, Option[java.time.Instant]] = {
    if (s == null || s.isEmpty || s == "null") Right(None)
    else if (s.length == 10)
      scala.util.Try(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant)
        .toEither.left.map(e => s"bad date: ${e.getMessage}").map(Some(_))
    else
      scala.util.Try(java.time.OffsetDateTime.parse(s, rfc3339).toInstant)
        .toEither.left.map(e => s"bad datetime: ${e.getMessage}").map(Some(_))
  }
}
