package graft

import org.apache.spark.sql.functions._

import graft.functions.AutomationStringify
import graft.operators.MessageNormalize

/** The distill4 deep normalizers: Tupper proxy dedup, snippet
  * resolution, and automation-run stringification (reference:
  * distill4_normalize.py:205-375). */
class NormalizeSpec extends SparkTestBase {

  test("tupper dedup replaces content with a later bot repost at 70-100% length") {
    import spark.implicits._
    // ord 1: original "Xx: hello there friend xX" (25 chars);
    //   bot repost at ord 3 "hello there friend" (18 chars, ratio .72) -> replaces
    // ord 10: repost ratio too small (4/26=0.15) -> kept
    // ord 20: similar message by SAME author -> not a repost -> kept
    val events = Seq(
      (1L, 1L, "alice", false, "Xx: hello there friend xX"),
      (1L, 2L, "bob", false, "unrelated chatter"),
      (1L, 3L, "tupperhook", true, "hello there friend"),
      (1L, 10L, "carol", false, "long message where repost is tiny"),
      (1L, 11L, "hook", true, "tiny"),
      (1L, 20L, "dave", false, "self similar self similar!"),
      (1L, 21L, "dave", false, "self similar self similar")
    ).toDF("instance_id", "ord", "author", "is_bot", "content")
    val got = MessageNormalize
      .tupperDedup(events, "instance_id", "ord", "author", "is_bot", "content")
      .select(col("ord"), col("norm_content"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "hello there friend")
    assert(got(10L) == "long message where repost is tiny")
    assert(got(20L) == "self similar self similar!")
  }

  test("snippet resolution replaces the first matching word per snippet after prefix normalization") {
    import spark.implicits._
    val commands = Seq(
      (100L, "$cast fireball sneak sneak", "$"),
      (101L, "!attack goblin", "!"),
      (102L, "?init next", "?")
    ).toDF("cmd_id", "content", "prefix")
    // two resolutions for cmd 100: 'sneak' expands (first occurrence
    // only), then 'fireball' expands; cmd 102 has no snippets
    val snippets = Seq(
      (100L, 1L, "sneak", "-d 2d6[sneak]"),
      (100L, 2L, "fireball", "cast fireball -i")
    ).toDF("cmd_id", "ord", "name", "after")
    val got = MessageNormalize.resolveSnippets(commands, snippets,
        "cmd_id", "content", "prefix", "ord", "name", "after")
      .select(col("cmd_id"), col("norm_command"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(100L) == "!cast cast fireball -i -d 2d6[sneak] sneak")
    assert(got(101L) == "!attack goblin")
    assert(got(102L) == "!init next")
  }

  test("automation stringification narrates the nested result tree") {
    val tree =
      """{"type":"root","children":[
        |  {"type":"target_iteration","target_index":0,"results":[
        |    {"type":"attack","did_hit":true,"did_crit":true,"children":[
        |      {"type":"damage","damage":12},
        |      {"type":"ieffect","effect":{"name":"Prone"}}]}]},
        |  {"type":"target_iteration","target_type":"self","results":[
        |    {"type":"damage","damage":-5},
        |    {"type":"temphp","amount":3}]},
        |  {"type":"unknown_node"}
        |]}""".stripMargin
    val got = AutomationStringify.stringify(tree, "Ara", Seq("Goblin"))
    assert(got ==
      """Ara attacked Goblin and crit!
        |Goblin took 12 damage.
        |Goblin gained Prone.
        |Ara healed for -5 health.
        |Ara gained 3 temp HP.""".stripMargin)
  }

  test("automation stringification accepts decimal-point numbers") {
    val tree =
      """{"type":"root","children":[
        |  {"type":"target_iteration","target_index":0.0,"results":[
        |    {"type":"damage","damage":7.5},
        |    {"type":"temphp","amount":2.0}]}
        |]}""".stripMargin
    val got = AutomationStringify.stringify(tree, "Ara", Seq("Goblin"))
    assert(got ==
      """Goblin took 7.5 damage.
        |Goblin gained 2.0 temp HP.""".stripMargin)
  }

  test("automation stringification: saves, checks and contests") {
    val tree =
      """{"type":"root","children":[
        |  {"type":"target_iteration","target_index":0,"results":[
        |    {"type":"save","ability":"dexteritySave","did_save":false,"children":[
        |      {"type":"damage","damage":8}]},
        |    {"type":"check","skill_name":"athletics","did_succeed":true,"children":[]},
        |    {"type":"check","skill_name":"acrobatics","did_succeed":false,
        |     "contest_skill_name":"athletics","children":[]},
        |    {"type":"remove_ieffect","removed_effect":{"name":"Grappled"}}]}
        |]}""".stripMargin
    val got = AutomationStringify.stringify(tree, "Brom", Seq("Ogre"))
    assert(got ==
      """Ogre rolled a Dexterity save but failed.
        |Ogre took 8 damage.
        |Ogre rolled a athletics check and succeeded.
        |
        |Ogre rolled a acrobatics contest against Brom's athletics but failed.
        |
        |Ogre is no longer Grappled.""".stripMargin)
  }
}
