package graft.parity

/** S8: run configuration (reference call-debias.py:27-35, gui.py:23-33,
  * config.ini.example). INI `[settings]` section with typed getters and
  * the GUI's defaults; keys are case-insensitive like Python's
  * configparser. Not a dataflow op — a constructor argument for the
  * pipeline (SURVEY.md §1.1), never ambient state.
  */
final case class PipelineConfig(
    inputFolder: String = "./input",
    outputFolder: String = "./output",
    useNer: Boolean = true,
    useLlm: Boolean = false,
    maxRetries: Int = 5)

object PipelineConfig {

  /** Parse INI text: `[section]` headers, `key = value` pairs, `#`/`;`
    * comment lines blank lines ignored. Only the `settings` section is
    * read (reference behavior); unknown keys are ignored, missing keys
    * keep the GUI defaults (gui.py:23-33). */
  def fromIni(ini: String): PipelineConfig = {
    val settings = scala.collection.mutable.Map[String, String]()
    var section = ""
    ini.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim.toLowerCase
      case l if l.contains("=") && section == "settings" =>
        val Array(k, v) = l.split("=", 2)
        settings(k.trim.toLowerCase) = v.trim
      case _ => () // configparser would error on stray lines; reference never hits it
    }
    val d = PipelineConfig()
    // configparser.getboolean semantics EXACTLY: 1/yes/true/on -> true,
    // 0/no/false/off -> false, anything else raises — the reference
    // crashes loudly on a typo'd flag; mapping unknowns to false would
    // silently run a differently-configured pipeline
    def bool(v: String): Boolean = v.toLowerCase match {
      case "1" | "yes" | "true" | "on" => true
      case "0" | "no" | "false" | "off" => false
      case other => throw new IllegalArgumentException(
        s"Not a boolean: '$other' (configparser.getboolean accepts 1/yes/true/on/0/no/false/off)")
    }
    PipelineConfig(
      inputFolder = settings.getOrElse("input_folder", d.inputFolder),
      outputFolder = settings.getOrElse("output_folder", d.outputFolder),
      useNer = settings.get("use_ner").map(bool).getOrElse(d.useNer),
      useLlm = settings.get("use_llm").map(bool).getOrElse(d.useLlm),
      maxRetries = settings.get("max_retries").map(_.toInt).getOrElse(d.maxRetries))
  }

  def fromFile(path: String): PipelineConfig =
    fromIni(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
