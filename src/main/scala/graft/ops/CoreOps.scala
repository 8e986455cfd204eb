package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text normalization used before joining / hashing.
  * Semantics from reference etl1_clean_and_stage.py:66,100,104-108 and
  * etl2_advclean_and_dimcreatin.py:105-117,156-162. */
object Norm {
  /** lower(trim(x)) — the canonical join/hash normalization
    * (reference etl2:200-202,221-226). */
  def lowerTrim(c: Column): Column = lower(trim(c))

  /** Strip trailing punctuation off a maker/brand name
    * (reference etl1:66). */
  def cleanMaker(c: Column): Column =
    regexp_replace(trim(c), "[\\.,]+$", "")

  /** Keep only model-safe characters (reference etl1:100). */
  def cleanModelDesc(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9\\s\\+\\-\\(\\)\\./]", "")

  /** NULL/blank → sentinel, else normalized (reference etl2:156). */
  def orUnknown(c: Column, sentinel: String = "UNKNOWN"): Column =
    coalesce(nullif(trim(c), lit("")), lit(sentinel))
}

/** Multi-format defensive date parsing
  * (reference etl1_clean_and_stage.py:32-53).
  * Raw strings are cleaned (strip non-date chars, unify separators),
  * then parsed by shape; unparseable → null. */
object DateParse {
  /** `[^\d/.\-]` strip + `[.\-]`→`/` (reference etl1:36-39). */
  def cleanDateStr(c: Column): Column =
    regexp_replace(regexp_replace(c, "[^\\d/.\\-]", ""), "[\\.\\-]", "/")

  /** Shape-dispatched to_date over dd/MM/yyyy | yyyy/MM/dd | dd/MM/yy
    * (reference etl1:40-49). 2-digit years resolve per the session's
    * time parser policy. */
  def parseMulti(c: Column): Column = {
    val u = cleanDateStr(c)
    when(u.rlike("^\\d{2}/\\d{2}/\\d{4}$"), to_date(u, "dd/MM/yyyy"))
      .when(u.rlike("^\\d{4}/\\d{2}/\\d{2}$"), to_date(u, "yyyy/MM/dd"))
      .when(u.rlike("^\\d{2}/\\d{2}/\\d{2}$"), to_date(u, "dd/MM/yy"))
      .otherwise(lit(null).cast("date"))
  }

  /** date → int yyyyMMdd surrogate date key (reference etl2:263-267). */
  def dateKey(c: Column): Column =
    date_format(c, "yyyyMMdd").cast("int")
}

/** Row-level column-misalignment repair: an office name that landed in
  * the `fromdate` column is moved to `OfficeCd`
  * (reference etl1_clean_and_stage.py:76-94). */
object Repair {
  val OfficePattern = "(?i)^(RTA|UNIT OFFICE|MVI|DTO|ZONAL|TRANSPORT).*"
  val StateCodePattern = "(?i)^(TS|TG)$"

  /** Returns (repairedOffice, repairedFromdate). */
  def officeCdRepair(officeCd: Column, fromdate: Column): (Column, Column) = {
    val officeLike = fromdate.rlike(OfficePattern)
    val office = when(officeLike && officeCd.isNull, fromdate)
      .when(officeCd.rlike(StateCodePattern), lit(null).cast("string"))
      .otherwise(officeCd)
    val fd = when(officeLike, lit(null).cast("string")).otherwise(fromdate)
    (office, fd)
  }
}

/** Regex classifiers (reference etl1:101-130, etl2:112-135). */
object Classify {
  /** Fuel-class style when-chain over free text
    * (reference etl1:120-124). */
  def fuelClass(c: Column): Column = {
    val u = upper(coalesce(c, lit("")))
    when(u.rlike("BATTERY|ELECTRIC"), lit("ELECTRIC"))
      .when(u.rlike("PETROL|GASOLINE"), lit("PETROL"))
      .when(u.rlike("DIESEL"), lit("DIESEL"))
      .when(u.rlike("CNG"), lit("CNG"))
      .when(u.rlike("LPG"), lit("LPG"))
      .otherwise(lit("OTHERS"))
  }

  /** Emission standard extraction, group 1 (reference etl2:125,132). */
  def emissionStd(c: Column): Column = {
    val e = regexp_extract(upper(coalesce(c, lit(""))),
      "(BS\\s?III[AB]?|BS\\s?IV|BS\\s?V|BS\\s?VI)", 1)
    when(e === "", lit("UNKNOWN")).otherwise(regexp_replace(e, "\\s", ""))
  }

  /** makeYear repair: 2-digit → 20xx, 4-digit kept, year-in-text
    * extracted, else UNKNOWN (reference etl1:127-130, etl2:112-117). */
  def yearFix(c: Column): Column = {
    val t = trim(coalesce(c, lit("")))
    val inText = regexp_extract(t, "(19\\d{2}|20[0-2]\\d)", 0)
    when(t.rlike("^[0-9]{2}$"), concat(lit("20"), t))
      .when(t.rlike("^[0-9]{4}$"), t)
      .when(inText =!= "", inText)
      .otherwise(lit("UNKNOWN"))
  }
}

/** Keyed deduplication. */
object Dedup {
  /** Deterministic keep-one-row-per-key: row_number over
    * (partitionBy keys, orderBy order), keep rank 1
    * (reference etl1:68-70 newest-wins; etl2:236-238 best-match).
    * Scale note: one hash-partition shuffle on `keys`; no skew issue
    * unless a single key dominates — salt upstream if so. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

/** Content-addressed surrogate keys: SHA-256 over '|'-joined normalized
  * natural-key parts (reference etl2_advclean_and_dimcreatin.py:156-162).
  * Deterministic and idempotent across runs — no identity columns, so
  * dimension builds are embarrassingly parallel at any scale. */
object Keys {
  def sha(parts: Column*): Column =
    sha2(concat_ws("|", parts.map(p => Norm.orUnknown(p)): _*), 256)
}
