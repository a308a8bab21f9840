package graft.functions

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Narrates an automation-result tree (the nested JSON an automation
  * run emits) as battle text — the reference's automation-run
  * stringification (reference: distill4_normalize.py:205-305
  * `stringify_automation_run`): a recursive walk where container
  * nodes (root/condition/spell/target) concatenate their children,
  * target-iteration nodes rebind the "current target", and leaf nodes
  * (attack/save/damage/temphp/ieffect/check) each render one line.
  *
  * Unknown node types and empty renderings are skipped, matching the
  * reference's falsy-filtering concatenation. The embed-title lookup
  * half of the reference function needs the surrounding message
  * stream and lives with the message-group operators, not here.
  *
  * Execution model: a pure per-row String→String function — runs via
  * Dataset.map / a registered UDF; embarrassingly parallel, no state,
  * no shuffle. (Recursive heterogeneous trees are not expressible
  * with from_json struct schemas or built-in HOFs, so this is the
  * documented escape hatch (d) of the operator preference order.)
  */
object AutomationStringify {

  /** Renders the automation_result tree. `caster` and `targets` come
    * from the run event's caster.name / targets[].name fields. */
  def stringify(automationResultJson: String, caster: String,
                targets: Seq[String]): String = {
    val root = JsonMethods.parse(automationResultJson)
    render(root, caster, targets, current = None).getOrElse("")
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }
  private def bool(v: JValue): Option[Boolean] = v match {
    case JBool(b) => Some(b)
    case _ => None
  }
  // JSON numbers may parse as int OR double ("12" vs "12.0"): accept
  // both for the numeric value, and render doubles as the source
  // would ("12.0"), so no node is silently dropped on a decimal point
  private def numVal(v: JValue): Option[BigDecimal] = v match {
    case JInt(i) => Some(BigDecimal(i))
    case JLong(l) => Some(BigDecimal(l))
    case JDouble(d) => Some(BigDecimal(d))
    case JDecimal(d) => Some(d)
    case _ => None
  }
  private def numShow(v: JValue): Option[String] = v match {
    case JInt(i) => Some(i.toString)
    case JLong(l) => Some(l.toString)
    case JDouble(d) => Some(d.toString)
    case JDecimal(d) => Some(d.toString)
    case _ => None
  }

  private def renderMany(nodes: JValue, caster: String, targets: Seq[String],
                         current: Option[String]): Option[String] = {
    val parts = (nodes match {
      case JArray(xs) => xs
      case _ => Nil
    }).flatMap(n => render(n, caster, targets, current).filter(_.nonEmpty))
    Some(parts.mkString("\n"))
  }

  private def render(node: JValue, caster: String, targets: Seq[String],
                     current: Option[String]): Option[String] = {
    val tgt = current.getOrElse("")
    str(node \ "type") match {
      case Some("root") | Some("condition") | Some("spell") =>
        renderMany(node \ "children", caster, targets, current)
      case Some("target") =>
        renderMany(node \ "results", caster, targets, current)
      case Some("target_iteration") if str(node \ "target_type").contains("self") =>
        renderMany(node \ "results", caster, targets, Some(caster))
      case Some("target_iteration") =>
        numVal(node \ "target_index") match {
          case Some(i) if i.isWhole && i >= 0 && i < targets.size =>
            renderMany(node \ "results", caster, targets, Some(targets(i.toInt)))
          case _ => None
        }
      case Some("attack") =>
        (bool(node \ "did_hit"), bool(node \ "did_crit")) match {
          case (Some(hit), Some(crit)) =>
            val children = renderMany(node \ "children", caster, targets, current).getOrElse("")
            val outcome =
              if (crit) "and crit!" else if (hit) "and hit." else "but missed."
            Some(s"$caster attacked $tgt $outcome\n$children")
          case _ => None
        }
      case Some("save") =>
        (str(node \ "ability"), bool(node \ "did_save")) match {
          case (Some(ability), Some(success)) =>
            val children = renderMany(node \ "children", caster, targets, current).getOrElse("")
            val name = ability.dropRight(4).capitalize
            val outcome = if (success) "and succeeded." else "but failed."
            Some(s"$tgt rolled a $name save $outcome\n$children")
          case _ => None
        }
      case Some("damage") =>
        for (amount <- numVal(node \ "damage"); shown <- numShow(node \ "damage"))
          yield if (amount < 0) s"$tgt healed for $shown health."
          else s"$tgt took $shown damage."
      case Some("temphp") =>
        numShow(node \ "amount").map(a => s"$tgt gained $a temp HP.")
      case Some("ieffect") =>
        str(node \ "effect" \ "name").map(n => s"$tgt gained $n.")
      case Some("remove_ieffect") =>
        str(node \ "removed_effect" \ "name").map(n => s"$tgt is no longer $n.")
      case Some("check") =>
        (str(node \ "skill_name"), bool(node \ "did_succeed")) match {
          case (Some(skill), Some(success)) =>
            val children = renderMany(node \ "children", caster, targets, current).getOrElse("")
            val outcome = if (success) "and succeeded." else "but failed."
            val base = str(node \ "contest_skill_name") match {
              case Some(contest) =>
                s"$tgt rolled a $skill contest against $caster's $contest $outcome"
              case None =>
                s"$tgt rolled a $skill check $outcome"
            }
            Some(s"$base\n$children")
          case _ => None
        }
      case _ => None
    }
  }
}
