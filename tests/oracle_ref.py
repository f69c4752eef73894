"""Line-faithful transcription of the reference's deterministic
post-processing — TEST ORACLE ONLY, never imported by sparkocr/.

The reference itself is not importable in this sandbox (PIL/transformers/
fitz absent), so golden outputs are generated/verified against this
transcription. Structure intentionally mirrors the reference 1:1 (naive
sequential str.replace etc.) so that the production implementation in
``sparkocr.textproc.grounding`` — a different algorithm (segment splicing
with offset tracking) — is checked against it by golden and property tests.

Sources transcribed:
- clean_output_text            app/utils.py:98-127
- clean_formula                app/utils.py:85-95
- extract_grounding_references app/utils.py:54-57
- re_match (CLI, image/other)  run_dpsk_ocr_pdf.py:129-141
- PDF CLI page post-processing run_dpsk_ocr_pdf.py:292-320
- eval-batch post-processing   run_dpsk_ocr_eval_batch.py:156-169
- bbox denormalization         run_dpsk_ocr_image.py:108-115
(`eval` of coords replaced by ast.literal_eval — safety divergence,
identical on literal inputs, which is all the fixtures contain.)
"""

from __future__ import annotations

import ast
import re

EOS = "<\uff5cend\u2581of\u2581sentence\uff5c>"
PATTERN = r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)"


def clean_output_text(text: str, include_images: bool = False, remove_labels: bool = False) -> str:
    """app/utils.py:98-127, verbatim logic."""
    if not text:
        return ""
    matches = re.findall(PATTERN, text, re.DOTALL)
    img_num = 0
    for match in matches:
        if "<|ref|>image<|/ref|>" in match[0]:
            if include_images:
                text = text.replace(match[0], f"\n\n**[\u56fe\u7247 {img_num + 1}]**\n\n", 1)
                img_num += 1
            else:
                text = text.replace(match[0], "", 1)
        else:
            if remove_labels:
                text = text.replace(match[0], "", 1)
            else:
                text = text.replace(match[0], match[1], 1)
    text = text.replace(EOS, "")
    return text.strip()


def clean_formula(text: str) -> str:
    """app/utils.py:85-95, verbatim logic."""
    formula_pattern = r"\\\[(.*?)\\\]"

    def process_formula(match):
        formula = match.group(1)
        formula = re.sub(r"\\quad\s*\([^)]*\)", "", formula)
        formula = formula.strip()
        return r"\[" + formula + r"\]"

    return re.sub(formula_pattern, process_formula, text)


def re_match(text):
    """run_dpsk_ocr_pdf.py:129-141, verbatim logic."""
    matches = re.findall(PATTERN, text, re.DOTALL)
    mathes_image = []
    mathes_other = []
    for a_match in matches:
        if "<|ref|>image<|/ref|>" in a_match[0]:
            mathes_image.append(a_match[0])
        else:
            mathes_other.append(a_match[0])
    return matches, mathes_image, mathes_other


def extract_coordinates_and_label(ref_text, image_width, image_height):
    """run_dpsk_ocr_image.py:72-82 (eval → literal_eval)."""
    try:
        label_type = ref_text[1]
        cor_list = ast.literal_eval(ref_text[2])
    except Exception:
        return None
    return (label_type, cor_list)


def denorm_boxes(cor_list, image_width, image_height):
    """run_dpsk_ocr_image.py:108-115 denormalization loop; malformed boxes
    skipped per the enclosing try/except."""
    out = []
    for points in cor_list:
        try:
            x1, y1, x2, y2 = points
        except Exception:
            continue
        out.append(
            [
                int(x1 / 999 * image_width),
                int(y1 / 999 * image_height),
                int(x2 / 999 * image_width),
                int(y2 / 999 * image_height),
            ]
        )
    return out


def pdf_cli_page(content: str, jdx: int, skip_repeat: bool = True):
    """run_dpsk_ocr_pdf.py:292-320, per-page markdown path.

    Returns (cleaned_content, dropped).
    """
    if EOS in content:
        content = content.replace(EOS, "")
    else:
        if skip_repeat:
            return "", True
    matches_ref, matches_images, mathes_other = re_match(content)
    for idx, a_match_image in enumerate(matches_images):
        content = content.replace(
            a_match_image, f"![](images/" + str(jdx) + "_" + str(idx) + ".jpg)\n"
        )
    for idx, a_match_other in enumerate(mathes_other):
        content = (
            content.replace(a_match_other, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
        )
    return content, False


PAGE_SPLIT_SUFFIX = "\n\n<--- Page Split --->\n"


def assemble_pdf_doc(cleaned_pages) -> str:
    """run_dpsk_ocr_pdf.py:302-304,323 — page-split suffix after every page."""
    contents = ""
    for page in cleaned_pages:
        contents += page + "\n" + "\n<--- Page Split --->" + "\n"
    return contents


def eval_batch_page(content: str) -> str:
    """run_dpsk_ocr_eval_batch.py:156-169, per-image markdown path.

    NB: the eval-batch script defines its OWN re_match (:75-84) whose
    "other" list holds EVERY full match — image refs included — unlike the
    PDF script's image/other split. Transcribe that faithfully."""
    content = clean_formula(content)
    matches = re.findall(PATTERN, content, re.DOTALL)
    mathes_other = [m[0] for m in matches]
    for idx, a_match_other in enumerate(mathes_other):
        content = (
            content.replace(a_match_other, "")
            .replace("\\n\\n\\n\\n", "\\n\\n")
            .replace("\\n\\n\\n", "\\n\\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content
