package graft.parity

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S8 config source: INI parse semantics matching Python configparser on
  * the reference's config.ini shape. */
class ConfigSpec extends AnyFunSuite with Matchers {

  test("parses the reference example config") {
    val ini = """
      |#
      |#   Default config
      |#
      |[settings]
      |input_folder = ./my input
      |output_folder = /data/out
      |use_ner = true
      |use_llm = false
      |max_retries = 7
      |""".stripMargin
    PipelineConfig.fromIni(ini) shouldBe PipelineConfig(
      "./my input", "/data/out", useNer = true, useLlm = false, maxRetries = 7)
  }

  test("missing keys fall back to the GUI defaults") {
    PipelineConfig.fromIni("[settings]\nuse_llm = yes\n") shouldBe
      PipelineConfig(useLlm = true)
    PipelineConfig.fromIni("") shouldBe PipelineConfig()
  }

  test("getboolean rejects non-boolean values like configparser does") {
    // the reference crashes loudly on a typo'd flag; silently mapping
    // 'enabled' to false would run a differently-configured pipeline
    PipelineConfig.fromIni("[settings]\nuse_ner = off\n") shouldBe
      PipelineConfig(useNer = false)
    an[IllegalArgumentException] should be thrownBy
      PipelineConfig.fromIni("[settings]\nuse_ner = enabled\n")
  }

  test("keys are case-insensitive and values keep embedded separators") {
    val c = PipelineConfig.fromIni(
      "[SETTINGS]\nINPUT_FOLDER = a = b\nUSE_NER = On\nMAX_RETRIES = 3")
    c.inputFolder shouldBe "a = b" // split on FIRST '=' only
    c.useNer shouldBe true         // configparser boolean forms: 1/yes/true/on
    c.maxRetries shouldBe 3
  }

  test("other sections are ignored") {
    PipelineConfig.fromIni("[other]\nmax_retries = 99\n[settings]\nmax_retries = 2")
      .maxRetries shouldBe 2
  }
}
