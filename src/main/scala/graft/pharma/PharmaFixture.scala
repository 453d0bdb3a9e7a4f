package graft.pharma

/** Deterministic synthetic medication feed shaped like the upstream
  * DZ-Pharma-Data `meds.json` (FIXTURES.md §1): a JSON object keyed by
  * first letter, each value an array of medication records.
  *
  * Includes every edge case the cleaning pass triages
  * (Pharma_Ingestion_Cleaning.py:100-112 semantics): null / empty /
  * digit-free / zero price texts, null refundable, nulls in each ML
  * feature column, and prices on every bucket boundary
  * (50/100/200/500/1000). Refundability correlates with price band so the
  * ML stage has signal. Pure function of the record index — no RNG.
  */
object PharmaFixture {

  private val letters = Seq("A", "B", "C", "D", "E")
  private val labs = Seq("ALDAPH", "BIOCARE", "CURAMED", "DELTALAB", "EUROPHARM", "FRATER")
  private val forms = Seq("Comprimé", "Sirop", "Injectable", "Gélule", "Pommade")
  private val therap = Seq("ANTIBIOTIQUES", "ANTALGIQUES", "CARDIOLOGIE", "DERMATOLOGIE", "DIABETE", "NEUROLOGIE")
  private val pharmaco = Seq("PENICILLINES", "PARACETAMOL", "BETABLOQUANTS", "CORTICOIDES", "INSULINES", "ANTIEPILEPTIQUES")
  private val generics = Seq("amoxicilline", "paracetamol", "atenolol", "betamethasone", "insuline", "", "carbamazepine")
  // Exercises every price bucket edge: 50/100/200/500/1000 exactly,
  // plus interiors and a >1000 tail.
  private val prices = Seq(25, 50, 75, 100, 150, 200, 350, 500, 750, 1000, 1500, 2500)

  def recordJson(i: Int): String = {
    val price = prices(i % prices.length)
    val rate = i % 10 match {
      case 7 => "null" // null reference_rate → price NULL → dropped
      case 8 => "\"\"" // empty → price NULL → dropped
      case 9 => "\"gratuit\"" // no digits → price NULL → dropped
      case 3 if i % 20 == 3 => "\"0 DA\"" // zero price → dropped
      case _ => s""""$price.00 DA""""
    }
    // Cheap drugs are mostly covered, expensive mostly not; every 11th
    // unknown (null) — the reference's tri-state.
    val refundable =
      if (i % 11 == 10) "null"
      else if (price <= 200) { if (i % 7 == 6) "false" else "true" }
      else { if (i % 5 == 4) "true" else "false" }
    val form = if (i % 13 == 12) "null" else s""""${forms(i % forms.length)}""""
    val generic = s""""${generics(i % generics.length)}""""
    val labName = if (i % 17 == 16) "null" else s""""${labs(i % labs.length)}""""
    val therapC = if (i % 19 == 18) "null" else s""""${therap(i % therap.length)}""""
    s"""{"name": "MED-${letters(i % letters.length)}-$i",
       |"generic": $generic, "form": $form, "reference_rate": $rate,
       |"refundable": $refundable,
       |"lab": {"name": $labName, "address": "Rue ${i % 40}, Alger",
       |"tel": "021-${1000 + i}", "web": "lab${i % labs.length}.dz"},
       |"class": {"therapeutic": $therapC,
       |"pharmacological": "${pharmaco(i % pharmaco.length)}"}}""".stripMargin
  }

  /** The full feed: `n` records distributed across first-letter keys. */
  def feedJson(n: Int = 300): String =
    letters.zipWithIndex.map { case (letter, li) =>
      val recs = (0 until n).filter(_ % letters.length == li).map(recordJson)
      s""""$letter": [${recs.mkString(",")}]"""
    }.mkString("{", ",", "}")

  /** Deterministic labs directory feed shaped like the upstream
    * `labs.json` (the reference's declared-but-unused second source,
    * Pharma_Ingestion_Cleaning.py:16): a JSON array of lab records.
    * Covers every lab name the meds feed references (join hits), two
    * labs with no medications (left-join misses: SAIDAL, GENERIS), and
    * null directory fields (web, wilaya). */
  def labsJson(): String = {
    val wilayas = Seq("Alger", "Oran", "Constantine", "Annaba",
      "Blida", "Setif", "Tizi Ouzou", "Bejaia")
    (labs ++ Seq("SAIDAL", "GENERIS")).zipWithIndex.map { case (name, i) =>
      val web = if (i % 4 == 3) "null" else s""""www.${name.toLowerCase}.dz""""
      val wilaya = if (i == 6) "null" else s""""${wilayas(i % wilayas.length)}""""
      s"""{"name": "$name", "address": "Zone industrielle ${i + 1}",
         |"tel": "021-9${100 + i}", "web": $web, "wilaya": $wilaya}""".stripMargin
    }.mkString("[", ",", "]")
  }
}
