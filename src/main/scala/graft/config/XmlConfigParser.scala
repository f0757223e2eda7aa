package graft.config

import java.io.{File, StringReader}
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import org.xml.sax.InputSource
import scala.collection.mutable.ArrayBuffer

/** Parses the XML mapping config into [[IntegrationConfig]].
  *
  * Driver-side only — never touches the data plane. Uses the JDK's
  * built-in `javax.xml` DOM parser (the build is offline; no external
  * XML library). Grammar per the reference's
  * config/mapping_config.xml:1-72 and parser src/xml_parser.py:74-156;
  * unlike the reference we keep ALL rule attributes (so declared-only
  * rules like `unique scope="daily"` carry their params through).
  */
object XmlConfigParser {

  def parseFile(path: String): IntegrationConfig =
    parse(newBuilder.parse(new File(path)))

  def parseString(xml: String): IntegrationConfig =
    parse(newBuilder.parse(new InputSource(new StringReader(xml))))

  private def newBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    // Hardening: the config is user-supplied; no DTDs / external entities.
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  private def parse(doc: Document): IntegrationConfig = {
    doc.getDocumentElement.normalize()
    val root = doc.getDocumentElement
    IntegrationConfig(
      source = parseSource(childElem(root, "SourceSystem")),
      target = parseTarget(childElem(root, "TargetSystem")),
      fieldMappings = childElemOpt(root, "FieldMappings")
        .map(fm => elems(fm, "Field").map(parseField))
        .getOrElse(Seq.empty),
      globalValidations = childElemOpt(root, "GlobalValidations")
        .map(gv =>
          elems(gv, "Validation").map(e =>
            GlobalValidation(e.getAttribute("rule"), attrsExcept(e, "rule"))
          )
        )
        .getOrElse(Seq.empty),
      etl = parseEtl(childElem(root, "ETLConfig"))
    )
  }

  private def parseSource(e: Element): SourceConfig = SourceConfig(
    name = e.getAttribute("name"),
    filePath = text(e, "FilePath").trim,
    // delimiter deliberately NOT trimmed — a literal tab/space delimiter
    // must survive; every other text field tolerates pretty-printed XML
    delimiter = textOpt(e, "Delimiter").getOrElse(","),
    hasHeader = textOpt(e, "HasHeader").forall(_.trim.equalsIgnoreCase("true"))
  )

  private def parseTarget(e: Element): TargetConfig = TargetConfig(
    name = e.getAttribute("name"),
    connectionString = textOpt(e, "ConnectionString").fold("")(_.trim),
    targetTable = textOpt(e, "TargetTable").fold("")(_.trim)
  )

  private def parseField(e: Element): FieldMapping = FieldMapping(
    sourceField = e.getAttribute("source"),
    targetField = e.getAttribute("target"),
    dataType = e.getAttribute("dataType"),
    required = e.getAttribute("required").trim.equalsIgnoreCase("true"),
    validations = elems(e, "Validation").map(v =>
      ValidationRule(v.getAttribute("rule"), attrsExcept(v, "rule"))
    )
  )

  private def parseEtl(e: Element): EtlConfig = EtlConfig(
    batchSize = textOpt(e, "BatchSize").map(_.trim.toInt).getOrElse(1000),
    errorHandling = textOpt(e, "ErrorHandling").fold("continue")(_.trim),
    logLevel = textOpt(e, "LogLevel").fold("detailed")(_.trim),
    archiveProcessedFiles =
      textOpt(e, "ArchiveProcessedFiles").exists(_.trim.equalsIgnoreCase("true"))
  )

  // --- tiny DOM helpers -------------------------------------------------

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    val buf = new ArrayBuffer[Element](nl.getLength)
    var i = 0
    while (i < nl.getLength) {
      nl.item(i) match {
        // direct children only — rule out grandchildren with the same tag
        case e: Element if e.getParentNode eq parent => buf += e
        case _ =>
      }
      i += 1
    }
    buf.toSeq
  }

  private def childElemOpt(parent: Element, tag: String): Option[Element] =
    elems(parent, tag).headOption

  private def childElem(parent: Element, tag: String): Element =
    childElemOpt(parent, tag).getOrElse(
      throw new IllegalArgumentException(s"config missing <$tag> element")
    )

  private def textOpt(parent: Element, tag: String): Option[String] =
    childElemOpt(parent, tag).map(_.getTextContent)

  private def text(parent: Element, tag: String): String =
    textOpt(parent, tag).getOrElse(
      throw new IllegalArgumentException(s"config missing <$tag> text")
    )

  private def attrsExcept(e: Element, skip: String): Map[String, String] = {
    val attrs = e.getAttributes
    (0 until attrs.getLength).iterator
      .map(attrs.item)
      .filter(_.getNodeName != skip)
      .map(n => n.getNodeName -> n.getNodeValue)
      .toMap
  }
}
