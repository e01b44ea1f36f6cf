"""Generate the checked-in golden .docx fixtures for the S10 DOCX
decoder (tests/fixtures/docx_*.docx) — run once, commit the output.

Each fixture is a spec-complete OPC container (content types,
package rels, document.xml under the real WordprocessingML
namespace) whose body reproduces what actual Word output looks like:
text split mid-word across runs on formatting/proofing boundaries,
proofErr/bookmark markers interleaved with runs, tabs and soft line
breaks as elements, tracked-change deletions, field instruction
text, a table (cell content is ordinary w:p paragraphs), numeric
character references and non-ASCII text. The expected extraction is
asserted byte-exactly in tests/test_html_connector.py — mammoth
extractRawText's shape (reference: globalautoregs.ts:110-116).
"""

from __future__ import annotations

import os
import zipfile

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxml'
    'formats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument'
    '/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _doc(body: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{body}'
        '<w:sectPr><w:pgSz w:w="11906" w:h="16838"/></w:sectPr>'
        "</w:body></w:document>"
    )


def _zip(path: str, document_xml: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("_rels/.rels", RELS)
        z.writestr("word/document.xml", document_xml)


# fixture 1: runs/tabs/breaks/entities — the inline-content gauntlet
RUNS_BODY = (
    # Word splits "Regulatory" mid-word on a proofing boundary; the
    # decoder must concatenate runs, not join them
    "<w:p><w:pPr><w:pStyle w:val=\"Heading1\"/></w:pPr>"
    "<w:proofErr w:type=\"spellStart\"/>"
    "<w:r><w:rPr><w:b/></w:rPr><w:t>Regu</w:t></w:r>"
    "<w:proofErr w:type=\"spellEnd\"/>"
    "<w:r><w:t>latory update</w:t></w:r></w:p>"
    # tab + soft break inside one paragraph; xml:space preserved space
    "<w:p><w:r><w:t>Section</w:t></w:r><w:r><w:tab/>"
    "<w:t xml:space=\"preserve\">1.2 </w:t></w:r>"
    "<w:r><w:br/><w:t>continued after break</w:t></w:r></w:p>"
    # entities (named + numeric), non-ASCII, bookmark markers
    "<w:p><w:bookmarkStart w:id=\"0\" w:name=\"_Ref1\"/>"
    "<w:r><w:t>R&amp;D costs &#8805; 10 k€ — approuvé</w:t></w:r>"
    "<w:bookmarkEnd w:id=\"0\"/></w:p>"
    # field instruction text and tracked-change deletion are NOT text
    "<w:p><w:r><w:fldChar w:fldCharType=\"begin\"/></w:r>"
    "<w:r><w:instrText xml:space=\"preserve\"> PAGEREF _Ref1 </w:instrText></w:r>"
    "<w:r><w:fldChar w:fldCharType=\"end\"/></w:r>"
    "<w:r><w:t>visible tail</w:t></w:r>"
    "<w:del w:id=\"9\"><w:r><w:delText>deleted draft</w:delText></w:r></w:del></w:p>"
    # an empty paragraph contributes nothing
    "<w:p/>"
)

# fixture 2: a 2x2 table between two body paragraphs — cell content
# is ordinary w:p paragraphs in document order
TABLE_BODY = (
    "<w:p><w:r><w:t>Before table</w:t></w:r></w:p>"
    "<w:tbl><w:tblPr><w:tblW w:w=\"0\" w:type=\"auto\"/></w:tblPr>"
    "<w:tr>"
    "<w:tc><w:tcPr/><w:p><w:r><w:t>Requirement</w:t></w:r></w:p></w:tc>"
    "<w:tc><w:tcPr/><w:p><w:r><w:t>Deadline</w:t></w:r></w:p></w:tc>"
    "</w:tr><w:tr>"
    "<w:tc><w:tcPr/><w:p><w:r><w:t>UN R155 audit</w:t></w:r></w:p></w:tc>"
    "<w:tc><w:tcPr/><w:p><w:r><w:t>2026-07-01</w:t></w:r></w:p></w:tc>"
    "</w:tr></w:tbl>"
    "<w:p><w:r><w:t>After table</w:t></w:r></w:p>"
)


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    _zip(os.path.join(out_dir, "docx_runs.docx"), _doc(RUNS_BODY))
    _zip(os.path.join(out_dir, "docx_table.docx"), _doc(TABLE_BODY))
    print("wrote docx_runs.docx, docx_table.docx")


if __name__ == "__main__":
    main()
