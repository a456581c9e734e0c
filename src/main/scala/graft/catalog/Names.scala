package graft.catalog

/** Schema-name normalization (SURVEY.md §2.4 C1; reference
  * `src/utils.py:7-80`): lowercase, transliterate Cyrillic/diacritics,
  * non-`[a-z0-9_]` → `_`, collapse runs, no leading digit, ≤63 chars,
  * fallback `schema_default`.
  *
  * The reference's docstring examples and its code disagree on digit
  * handling (`'123…'` → the code prepends `_` then `strip('_')`
  * removes it again; the doctest expects `'_123_test_schema'`). We
  * implement the DOCUMENTED intent: strip underscores first, then
  * guard the leading digit, so the result always starts with a letter
  * or underscore.
  */
object Names {

  private val Translit: Seq[(String, String)] = Seq(
    "а" -> "a", "б" -> "b", "в" -> "v", "г" -> "g", "д" -> "d", "е" -> "e",
    "ё" -> "e", "ж" -> "zh", "з" -> "z", "и" -> "i", "й" -> "y", "к" -> "k",
    "л" -> "l", "м" -> "m", "н" -> "n", "о" -> "o", "п" -> "p", "р" -> "r",
    "с" -> "s", "т" -> "t", "у" -> "u", "ф" -> "f", "х" -> "h", "ц" -> "ts",
    "ч" -> "ch", "ш" -> "sh", "щ" -> "sch", "ъ" -> "", "ы" -> "y", "ь" -> "",
    "э" -> "e", "ю" -> "yu", "я" -> "ya",
    "ä" -> "a", "ö" -> "o", "ü" -> "u", "ß" -> "ss",
    "é" -> "e", "è" -> "e", "ê" -> "e", "ë" -> "e",
    "á" -> "a", "à" -> "a", "â" -> "a", "ã" -> "a",
    "í" -> "i", "ì" -> "i", "î" -> "i",
    "ó" -> "o", "ò" -> "o", "ô" -> "o", "õ" -> "o",
    "ú" -> "u", "ù" -> "u", "û" -> "u",
    "ç" -> "c", "ñ" -> "n")

  val MaxLength = 63

  /** Normalize a display name to a valid schema identifier. Throws
    * on empty input (reference raises ValueError). */
  def normalizeSchemaName(name: String): String = {
    require(name != null && name.nonEmpty, "Schema name cannot be empty")
    // Locale.ROOT: default-locale toLowerCase turns 'I' into dotless
    // 'ı' on Turkish/Azeri JVMs, so the SAME display name would
    // normalize to DIFFERENT schema identifiers on differently
    // configured hosts and break lookups of previously created schemas
    var s = name.toLowerCase(java.util.Locale.ROOT).trim
    for ((from, to) <- Translit) s = s.replace(from, to)
    s = s.replaceAll("[^a-z0-9_]", "_")
    s = s.replaceAll("_+", "_")
    s = s.replaceAll("^_+|_+$", "")
    if (s.nonEmpty && s.head.isDigit) s = "_" + s
    if (s.length > MaxLength) s = s.substring(0, MaxLength).replaceAll("_+$", "")
    if (s.isEmpty) "schema_default" else s
  }
}
