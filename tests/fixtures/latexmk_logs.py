"""Hand-vendored REALISTIC pdflatex/latexmk log fixtures.

Shaped after real TeX Live output (banner, nested file opens, font info,
``-file-line-error`` error lines with ``l.N`` context, overfull boxes,
summaries) -- the grammar the synthetic fuzz corpus in
``test_tikz_reference_diff.py`` cannot fully imitate. Each entry is
(log_text, expected {line: msg} under the reference parser semantics).
``{ROOT}`` is substituted with the root document path.
"""

UNDEFINED_CONTROL_SEQ = ("""\
This is pdfTeX, Version 3.141592653-2.6-1.15.1 (TeX Live 2023) \
(preloaded format=pdflatex)
 restricted \\write18 enabled.
entering extended mode
({ROOT}
LaTeX2e <2022-11-01> patch level 1
L3 programming layer <2023-02-22>
(/usr/local/texlive/2023/texmf-dist/tex/latex/standalone/standalone.cls
Document Class: standalone 2022/10/10 v1.3b Class to compile TeX sub-files
(/usr/local/texlive/2023/texmf-dist/tex/latex/pgf/frontendlayer/tikz.sty
(/usr/local/texlive/2023/texmf-dist/tex/latex/pgf/basiclayer/pgf.sty)))
{ROOT}:4: Undefined control sequence.
l.4 \\drawa
          (0,0) -- (1,1);
{ROOT}:7: Missing \\endcsname inserted.
<to be read again>
                   \\protect
l.7 \\node at (2,2) {$x$}
[1{/usr/local/texlive/2023/texmf-var/fonts/map/pdftex/updmap/pdftex.map}]
(./doc.aux) )
(see the transcript file for additional information)
Output written on doc.pdf (1 page, 12345 bytes).
Transcript written on doc.log.
""", {4: "Undefined control sequence.",
      7: "Missing \\endcsname inserted."})

PACKAGE_ERROR_OTHER_FILE = ("""\
This is pdfTeX, Version 3.141592653-2.6-1.15.1 (TeX Live 2023)
entering extended mode
({ROOT}
(/usr/local/texlive/2023/texmf-dist/tex/latex/pgfplots/pgfplots.sty
/usr/local/texlive/2023/texmf-dist/tex/generic/pgf/math/pgfmath.code.tex:1023: \
Package PGF Math Error: Unknown function `fooo'.
l.1023 ...
)
{ROOT}:12: Package pgfplots Error: Sorry, the input coordinate `a' has not \
been defined.
l.12 \\addplot coordinates {(a,1)}
)
No pages of output.
Transcript written on doc.log.
""", {0: "Package PGF Math Error: Unknown function `fooo'.",
      12: "Package pgfplots Error: Sorry, the input coordinate `a' has not "
          "been defined."})

EMERGENCY_STOP = ("""\
This is pdfTeX, Version 3.141592653-2.6-1.15.1 (TeX Live 2023)
entering extended mode
({ROOT}
! Emergency stop.
<*> {ROOT}

!  ==> Fatal error occurred, no output PDF file produced!
Transcript written on doc.log.
""", {0: None})   # nothing parseable -> reference fatal fallback

WARNINGS_ONLY_SUCCESS = ("""\
This is pdfTeX, Version 3.141592653-2.6-1.15.1 (TeX Live 2023)
entering extended mode
({ROOT}
(/usr/local/texlive/2023/texmf-dist/tex/latex/base/article.cls)
Overfull \\hbox (15.0pt too wide) in paragraph at lines 5--7
[]\\OT1/cmr/m/n/10 some very long line here
[1] (./doc.aux)
LaTeX Warning: There were undefined references.
 )
Output written on doc.pdf (1 page, 9876 bytes).
""", {})

RUNAWAY_ARGUMENT = ("""\
This is pdfTeX, Version 3.141592653-2.6-1.15.1 (TeX Live 2023)
entering extended mode
({ROOT}
Runaway argument?
{(0,0) -- (1,1); \\node at (2,2) {$x$}; \\end{tikzpicture}
{ROOT}:9: Paragraph ended before \\tikz@collect was complete.
<to be read again>
                   \\par
l.9
{ROOT}:9: Extra }, or forgotten \\endgroup.
l.9
)
No pages of output.
""", {9: "Extra }, or forgotten \\endgroup."})

ALL = [UNDEFINED_CONTROL_SEQ, PACKAGE_ERROR_OTHER_FILE, EMERGENCY_STOP,
       WARNINGS_ONLY_SUCCESS, RUNAWAY_ARGUMENT]
