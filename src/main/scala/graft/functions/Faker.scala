package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generators mirroring chewdata's tera faker
  * functions (reference: src/updater/tera.rs:46-81 registers ~35 `fake_*`).
  *
  * The reference draws from RNG per record; at 100 TB scale reproducibility
  * and partition-independence matter more, so every generator here is a pure
  * function of a seed column (row id): `pick` hashes the seed (xxhash64) to
  * an index, `pickMod` uses plain modulo when SQL-oracle parity is needed.
  * All are built-in expressions — a generated table never leaves codegen.
  */
object Faker {

  private def arr(values: Seq[String]): Column = array(values.map(lit): _*)

  /** Hash-seeded pick (well-mixed, partition-independent). */
  def pick(values: Seq[String], seed: Column): Column =
    element_at(arr(values), (pmod(xxhash64(seed), lit(values.size)) + 1).cast("int"))

  /** Modulo pick — oracle-reproducible in plain SQL. */
  def pickMod(values: Seq[String], idx: Column): Column =
    element_at(arr(values), (pmod(idx, lit(values.size)) + 1).cast("int"))

  val firstNames = Seq("Alice", "Bob", "Carlos", "Diana", "Elena", "Farid", "Grace", "Hiro", "Ines", "Jonas")
  val lastNames  = Seq("Martin", "Okafor", "Silva", "Tanaka", "Novak", "Haddad", "Kim", "Larsen", "Moreau", "Petrov")
  val words      = Seq("alpha", "bravo", "delta", "echo", "lima", "nova", "orbit", "pixel", "quartz", "raven", "sol", "terra")
  val titles     = Seq("Mr", "Mrs", "Ms", "Dr", "Prof")
  val jobSeniorities = Seq("junior", "senior", "staff", "principal", "lead")
  val jobFields  = Seq("engineering", "data", "design", "product", "security")
  val jobPositions = Seq("engineer", "analyst", "architect", "manager", "scientist")
  val cities     = Seq("Paris", "Lagos", "Lima", "Osaka", "Prague", "Tunis", "Seoul", "Oslo", "Lyon", "Sofia")
  val countries  = Seq("France", "Nigeria", "Peru", "Japan", "Czechia", "Tunisia", "Korea", "Norway", "Brazil", "Bulgaria")
  val countryCodes = Seq("FR", "NG", "PE", "JP", "CZ", "TN", "KR", "NO", "BR", "BG")
  val streets    = Seq("Main St", "High St", "Oak Ave", "Pine Rd", "Maple Ln", "Cedar Way")
  val stateNames = Seq("Ile-de-France", "Bavaria", "Catalonia", "Ontario", "Kanto", "Tuscany")
  val stateCodes = Seq("IDF", "BY", "CT", "ON", "KT", "TU")
  val timezones  = Seq("UTC", "Europe/Paris", "Asia/Tokyo", "America/Lima", "Africa/Lagos")
  val professions = Seq("teacher", "nurse", "developer", "farmer", "chef", "pilot")
  val industries = Seq("healthcare", "finance", "retail", "energy", "media", "transport")
  val currencies = Seq("Euro", "Naira", "Sol", "Yen", "Koruna", "Dinar", "Won", "Krone")
  val currencyCodes = Seq("EUR", "NGN", "PEN", "JPY", "CZK", "TND", "KRW", "NOK")
  val currencySymbols = Seq("€", "₦", "S/", "¥", "Kč", "DT", "₩", "kr")
  val colors     = Seq("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b")
  val userAgents = Seq(
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/126.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/124.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 14_4) Safari/605.1.15")

  def firstName(seed: Column): Column = pick(firstNames, seed)
  def lastName(seed: Column): Column  = pick(lastNames, seed)
  def title(seed: Column): Column     = pick(titles, seed)
  def word(seed: Column): Column      = pick(words, seed)
  def wordsN(seed: Column, n: Int): Column =
    concat_ws(" ", (0 until n).map(i => pick(words, seed * 31 + i)): _*)
  def sentence(seed: Column): Column =
    concat(initcap(wordsN(seed, 6)), lit("."))
  def sentences(seed: Column, n: Int): Column =
    concat_ws(" ", (0 until n).map(i => sentence(seed * 17 + i)): _*)
  def paragraph(seed: Column): Column = sentences(seed, 4)
  def jobSeniority(seed: Column): Column = pick(jobSeniorities, seed)
  def jobField(seed: Column): Column  = pick(jobFields, seed)
  def jobPosition(seed: Column): Column = pick(jobPositions, seed)
  def city(seed: Column): Column      = pick(cities, seed)
  def countryName(seed: Column): Column = pick(countries, seed)
  def countryCode(seed: Column): Column = pick(countryCodes, seed)
  def streetName(seed: Column): Column = pick(streets, seed)
  def stateName(seed: Column): Column = pick(stateNames, seed)
  def stateCode(seed: Column): Column = pick(stateCodes, seed)
  def zipcode(seed: Column): Column   = lpad((pmod(xxhash64(seed), lit(100000))).cast("string"), 5, "0")
  def postcode(seed: Column): Column  = zipcode(seed)
  def timezone(seed: Column): Column  = pick(timezones, seed)
  def latitude(seed: Column): Column  = round(pmod(xxhash64(seed), lit(180000000)) / 1e6 - 90.0, 6)
  def longitude(seed: Column): Column = round(pmod(xxhash64(seed * 7), lit(360000000)) / 1e6 - 180.0, 6)
  def profession(seed: Column): Column = pick(professions, seed)
  def industry(seed: Column): Column  = pick(industries, seed)
  def email(seed: Column): Column =
    concat(lower(firstName(seed)), lit("."), lower(lastName(seed)), lit("@example.com"))
  def ipv4(seed: Column): Column = {
    def o(i: Int) = pmod(xxhash64(seed * 13 + i), lit(256)).cast("string")
    concat_ws(".", o(0), o(1), o(2), o(3))
  }
  def ipv6(seed: Column): Column = {
    def o(i: Int) = lpad(hex(pmod(xxhash64(seed * 29 + i), lit(65536))), 4, "0")
    lower(concat_ws(":", (0 until 8).map(o): _*))
  }
  def macAddress(seed: Column): Column = {
    def o(i: Int) = lpad(hex(pmod(xxhash64(seed * 37 + i), lit(256))), 2, "0")
    lower(concat_ws(":", (0 until 6).map(o): _*))
  }
  def colorHex(seed: Column): Column  = pick(colors, seed)
  def userAgent(seed: Column): Column = pick(userAgents, seed)
  def digit(seed: Column): Column     = pmod(xxhash64(seed), lit(10)).cast("int")
  def phoneNumber(seed: Column): Column =
    concat(lit("+33 6 "), lpad(pmod(xxhash64(seed), lit(100000000)).cast("string"), 8, "0"))
  def currencyName(seed: Column): Column   = pick(currencies, seed)
  def currencyCode(seed: Column): Column   = pick(currencyCodes, seed)
  def currencySymbol(seed: Column): Column = pick(currencySymbols, seed)
  /** 16-digit number passing no Luhn check — synthetic-only, like the ref. */
  def creditCard(seed: Column): Column =
    lpad(pmod(xxhash64(seed), lit(10000000000000000L)).cast("string"), 16, "0")
  def barcode(seed: Column): Column =
    lpad(pmod(xxhash64(seed * 3), lit(10000000000000L)).cast("string"), 13, "0")
  def password(seed: Column): Column =
    substring(base64(xxhash64(seed).cast("string").cast("binary")), 1, 12)

  /** Name registry mirroring the reference's tera `fake_*` functions
    * (src/updater/tera.rs:46-81), used by template function calls and the
    * SQL-function registration. Every generator is seed-column-driven. */
  val registry: Map[String, Column => Column] = Map(
    "fake_first_name" -> firstName _,
    "fake_last_name" -> lastName _,
    "fake_title" -> title _,
    "fake_word" -> word _,
    "fake_words" -> (wordsN(_, 3)),
    "fake_sentence" -> sentence _,
    "fake_sentences" -> (sentences(_, 2)),
    "fake_paragraph" -> paragraph _,
    "fake_paragraphs" -> paragraph _,
    "fake_job_seniority" -> jobSeniority _,
    "fake_job_field" -> jobField _,
    "fake_job_position" -> jobPosition _,
    "fake_city" -> city _,
    "fake_country_name" -> countryName _,
    "fake_country_code" -> countryCode _,
    "fake_street_name" -> streetName _,
    "fake_state_name" -> stateName _,
    "fake_state_code" -> stateCode _,
    "fake_zipcode" -> zipcode _,
    "fake_postcode" -> postcode _,
    "fake_timezone" -> timezone _,
    "fake_latitude" -> (latitude(_).cast("string")),
    "fake_longitude" -> (longitude(_).cast("string")),
    "fake_profession" -> profession _,
    "fake_industry" -> industry _,
    "fake_email" -> email _,
    "fake_ipv4" -> ipv4 _,
    "fake_ipv6" -> ipv6 _,
    "fake_mac_address" -> macAddress _,
    "fake_color_hex" -> colorHex _,
    "fake_user_agent" -> userAgent _,
    "fake_digit" -> (digit(_).cast("string")),
    "fake_phone_number" -> phoneNumber _,
    "fake_currency_name" -> currencyName _,
    "fake_currency_code" -> currencyCode _,
    "fake_currency_symbol" -> currencySymbol _,
    "fake_credit_card" -> creditCard _,
    "fake_barcode" -> barcode _,
    "fake_password" -> password _)
}
