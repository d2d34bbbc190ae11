"""HTMLStripCharFilter parity tests.

Every vector below is ported from the reference's
``analysis/common/src/test/.../charfilter/TestHTMLStripCharFilter.java``
(method names preserved in comments); the batch tests additionally pin
that the Arrow fast path and the Python scanner agree document-by-document.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_spark.functions.html import (
    correct_offset,
    html_strip,
    html_strip_batch,
    html_strip_offsets,
)

REF_TEST_DIR = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/charfilter"
)


def test_basic():  # test()
    html = (
        '<div class="foo">this is some text</div> here is a <a href="#bar">link</a> and '
        'another <a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and "
        "another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert html_strip(html) == gold


def test_gamma():  # testGamma
    assert html_strip("&Gamma;", {"reserved"}) == "Γ"


def test_entities():  # testEntities
    test = "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    gold = "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(test, {"reserved"}) == gold


def test_more_entities():  # testMoreEntities
    test = "&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;"
    gold = "  <junk/>   ! @ and ’"
    assert html_strip(test, {"reserved"}) == gold


def test_reserved():  # testReserved
    test = (
        'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
        '<reserved ggg="hhhh"/> <other/>'
    )
    result = html_strip(test, {"reserved"})
    assert result.index("reserved") == 9
    assert result.index("reserved", 15) == 38
    assert result.index("reserved", 41) == 54
    assert "other" not in result


# testMalformedHTML — the full pinned table.
MALFORMED = [
    ("a <a hr<ef=aa<a>> </close</a>", "a <a hr<ef=aa> </close"),
    (
        '<a href=http://dmoz.org/cgi-bin/add.cgi?where=/arts/" class=lu '
        'style="font-size: 9px" target=dmoz>Submit a Site</a>',
        "Submit a Site",
    ),
    (
        "<a href=javascript:ioSwitch('p8','http://www.csmonitor.com/') "
        "title=expand id=e8 class=expanded rel=http://www.csmonitor.com/>"
        "Christian Science",
        "Christian Science",
    ),
    (
        '<link rel="alternate" type="application/rss+xml" title="San Francisco '
        '" 2008 RSS Feed" href="http://2008.sf.wordcamp.org/feed/" />',
        "\n",
    ),
    (
        '<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-'
        "knee-surgery symptoms.html, heat congestive heart failure <a href=\" "
        "http://www.symptoms1bad.happyhost.org/canine",
        '<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-'
        "knee-surgery symptoms.html, heat congestive heart failure <a href=\" "
        "http://www.symptoms1bad.happyhost.org/canine",
    ),
    (
        '<a href="http://ucblibraries.colorado.edu/how/index.htm"class="pageNavAreaText">',
        "",
    ),
    (
        '<link title="^\\" 21Sta\'s Blog" rel="search"  '
        'type="application/opensearchdescription+xml"  '
        'href="http://21sta.com/blog/inc/opensearch.php" />',
        "\n",
    ),
    ('<a href="#postcomment" title=""Leave a comment";">?', "?"),
    (
        "<a href='/modern-furniture'   ' id='21txt' class='offtab'   "
        "onMouseout=\"this.className='offtab';  return true;\" "
        "onMouseover=\"this.className='ontab';  return true;\">",
        "",
    ),
    (
        "<a href='http://alievi.wordpress.com/category/01-todos-posts/' "
        "style='font-size: 275%; padding: 1px; margin: 1px;' "
        "title='01 - Todos Post's (83)'>",
        "",
    ),
    (
        'The <a href=<a href="http://www.advancedmd.com>medical">'
        "http://www.advancedmd.com>medical</a> practice software</a>",
        'The <a href=medical">http://www.advancedmd.com>medical practice software',
    ),
    (
        '<a href="node/21426" class="clipTitle2" title="Levi.com/BMX 2008 Clip '
        'of the Week 29 "Morgan Wade Leftover Clips"">Levi.com/BMX 2008 Clip '
        "of the Week 29...",
        "Levi.com/BMX 2008 Clip of the Week 29...",
    ),
    (
        '<a href="printer_friendly.php?branch=&year=&submit=go&screen=";">'
        "Printer Friendly",
        "Printer Friendly",
    ),
    (
        '<a href=#" ondragstart="return false" onclick="window.external.'
        "AddFavorite('http://www.amazingtextures.com', 'Amazing Textures');"
        'return false" onmouseover="window.status=\'Add to Favorites\';'
        'return true">Add to Favorites',
        "Add to Favorites",
    ),
    (
        '<a href="../at_home/at_home_search.html"../_home/at_home_search.html">At',
        "At",
    ),
    (
        'E-mail: <a href=""mailto:XXXXXX@example.com" ">XXXXXX@example.com </a>',
        "E-mail: XXXXXX@example.com ",
    ),
    (
        '<li class="farsi"><a title="A\'13?" alt="A\'13?" '
        'href="http://www.america.gov/persian" alt="" name="A\'13?"A\'13? '
        'title="A\'13?">A\'13?</a></li>',
        "\nA'13?\n",
    ),
    (
        '<li><a href="#28" title="Hubert "Geese" Ausby">Hubert "Geese" '
        "Ausby</a></li>",
        '\nHubert "Geese" Ausby\n',
    ),
    ('<href="http://anbportal.com/mms/login.asp">', "\n"),
    ('<a href="', '<a href="'),
    ('<a href=">', ""),
    (
        '<a rel="nofollow" href="http://anissanina31.skyrock.com/'
        '1895039493-Hi-tout-le-monde.html" title=" Hi, tout le monde !>#</a>',
        "#",
    ),
    (
        '<a href="http://annunciharleydavidsonusate.myblog.it/" '
        'title="Annunci Moto e Accessori Harley Davidson" target="_blank">'
        '<img src="http://annunciharleydavidsonusate.myblog.it/images/'
        'Antipixel.gif" /></a>',
        "",
    ),
    (
        '<a href="video/addvideo&v=120838887181" onClick="return confirm('
        "'Are you sure you want  add this video to your profile? If it exists "
        "some video in your profile will be overlapped by this video!!')\" \" "
        "onmouseover=\"this.className='border2'\" "
        "onmouseout=\"this.className=''\">",
        "",
    ),
    ("<a href=#Services & Support>", ""),
    (
        '<input type="image" src="http://apologyindex.com/ThemeFiles/'
        '83401-72905/images/btn_search.gif"value="Search" name="Search" '
        'alt="Search" class="searchimage" onclick="incom =\'&sc=\' + '
        "document.getElementById('sel').value ; var dt ='&dt=' + "
        "document.getElementById('dt').value; var searchKeyword = "
        "document.getElementById('q').value ; searchKeyword = searchKeyword."
        "replace(/\\s/g,''); if (searchKeyword.length < 3){alert('Nothing to "
        "search. Search keyword should contain atleast 3 chars.'); return "
        "false; } var al='&al=' +  document.getElementById('advancedlink')."
        "style.display ;  document.location.href='http://apologyindex.com/"
        "search.aspx?q=' + document.getElementById('q').value + incom + dt "
        '+ al;" />',
        "",
    ),
    (
        '<input type="image" src="images/afbe.gif" width="22" height="22"  '
        'hspace="4" title="Add to Favorite" alt="Add to Favorite"onClick=" '
        "if(window.sidebar){ window.sidebar.addPanel(document.title,location."
        "href,''); }else if(window.external){ window.external.AddFavorite("
        "location.href,document.title); }else if(window.opera&&window.print) "
        '{ return true; }">',
        "",
    ),
    (
        '<area shape="rect" coords="12,153,115,305" href="http://'
        "statenislandtalk.com/v-web/gallery/Osmundsen-family\"Art's Norwegian "
        'Roots in Rogaland">',
        "\n",
    ),
    (
        '<a rel="nofollow" href="http://arth26.skyrock.com/660188240-bonzai'
        '.html" title="bonza>#',
        "#",
    ),
    ("<a href=  >", ""),
    ("<ahref=http:..", "<ahref=http:.."),
    ("<ahref=http:..>", "\n"),
    ('<ahref="http://aseigo.bddf.ca/cms/1025">A', "\nA"),
    (
        "<a href=\"javascript:calendar_window=window.open('/calendar.aspx?"
        "formname=frmCalendar.txtDate','calendar_window','width=154,"
        "height=188');calendar_window.focus()\">",
        "",
    ),
    (
        '<a href="/applications/defenseaerospace/19+rackmounts" title="19" '
        'Rackmounts">',
        "",
    ),
    (
        "<a href=http://www.azimprimerie.fr/flash/backup/lewes-zip-code/"
        "savage-model-110-manual.html title=savage model 110 manual "
        "rel=dofollow>",
        "",
    ),
    (
        '<a class="at" name="Lamborghini  href="http://lamborghini.'
        'coolbegin.com">Lamborghini /a>',
        "Lamborghini /a>",
    ),
    (
        "<A href='newslink.php?news_link=http%3A%2F%2Fwww.worldnetdaily.com"
        "%2Findex.php%3Ffa%3DPAGE.view%26pageId%3D85729&news_title=Florida "
        "QB makes 'John 3:16' hottest Google search Tebow inscribed Bible "
        "reference on eye black for championship game' TARGET=_blank>",
        "",
    ),
    ("<a href=/myspace !style='color:#993333'>", ""),
    ("<meta name=3DProgId content=3DExcel.Sheet>", "\n"),
    (
        '<link id=3D"shLink" href=3D"PSABrKelly-BADMINTONCupResults08FINAL'
        '2008_09_19=_files/sheet004.htm">',
        "\n",
    ),
    ('<td bgcolor=3D"#FFFFFF" nowrap>', "\n"),
    (
        '<a href="http://basnect.info/usersearch/"predicciones-mundiales-'
        '2009".html">"predicciones mundiales 2009"</a>',
        '"predicciones mundiales 2009"',
    ),
    (
        '<a class="comment-link" href="https://www.blogger.com/comment.g?'
        'blogID=19402125&postID=114070605958684588"location.href=https://'
        "www.blogger.com/comment.g?blogID=19402125&postID="
        "114070605958684588;>",
        "",
    ),
    (
        '<a href = "/videos/Bishop"/" title = "click to see more Bishop" '
        'videos">Bishop"</a>',
        'Bishop"',
    ),
    (
        '<a href="http://bhaa.ie/calendar/event.php?eid=20081203150127531"">'
        "BHAA Eircom 2 &amp; 5 miles CC combined start</a>",
        "BHAA Eircom 2 & 5 miles CC combined start",
    ),
    (
        '<a href="http://people.tribe.net/wolfmana" onClick=\'setClick'
        '("Application[tribe].Person[bb7df210-9dc0-478c-917f-436b896bcb79]")\''
        '" title="Mana">',
        "",
    ),
    (
        '<a  href="http://blog.edu-cyberpg.com/ct.ashx?id=6143c528-080c-4bb2-'
        'b765-5ec56c8256d3&url=http%3a%2f%2fwww.gsa.ac.uk%2fmackintoshsketchbook'
        '%2f"" eudora="autourl">',
        "",
    ),
    ('<input type="text" value="<search here>">', '<input type="text" value="\n">'),
    ('<input type="text" value="<search here">', '<input type="text" value="\n'),
    ('<input type="text" value="search here>">', '">'),
    (
        '<input type="text" value="&lt;search here&gt;" '
        "onFocus=\"this.value='<search here>'\">",
        "",
    ),
    (
        '<![if ! IE]>\n<link href="http://i.deviantart.com/icons/favicon.png" '
        'rel="shortcut icon"/>\n<![endif]>',
        "\n\n\n",
    ),
    (
        "<![if supportMisalignedColumns]>\n<tr height=0 style='display:none'>"
        "\n<td width=64 style='width:48pt'></td>\n</tr>\n<![endif]>",
        "\n\n\n\n\n\n\n\n",
    ),
]


@pytest.mark.parametrize("html,gold", MALFORMED, ids=range(len(MALFORMED)))
def test_malformed_html(html, gold):  # testMalformedHTML
    assert html_strip(html) == gold


def test_comment():  # testComment
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "
    body = "a " * 250
    assert html_strip("<!--" + body) == ""


def test_buffer_overflow_analogs():  # testBufferOverflow (no buffer here)
    filler = "a " * 600
    text = "ah<?> ??????" + filler
    assert html_strip(text) == text
    assert html_strip("<!--" + "a " * 2000 + "-->foo") == "foo"
    assert html_strip("<?" + "a " * 800 + "?>") == ""
    assert html_strip("<b " + "a " * 800 + "/>") == ""


def test_server_side_includes():  # testServerSideIncludes
    test = (
        'one<img src="image.png"\n'
        " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->"
        "\\'Comment\\'}'  -->\"\n\n"
        ' title="Title: <!--#echo var="IMAGE_CAPTION"-->">two'
    )
    assert html_strip(test) == "onetwo"

    test = (
        'one<script><!-- <!--#config comment="<!-- \\"comment\\"-->"--> -->'
        "</script>two"
    )
    assert html_strip(test) == "one\ntwo"


def test_script_quotes():  # testScriptQuotes
    test = (
        "one<script attr= bare><!-- action('<!-- comment -->', "
        '"\\"-->\\""); --></script>two'
    )
    assert html_strip(test) == "one\ntwo"
    test = "hello<script><!-- f('<!--internal--></script>'); --></script>"
    assert html_strip(test) == "hello\n"


def test_escape_script():  # testEscapeScript
    test = "one<script no-value-attr>callSomeMethod();</script>two"
    gold = "one<script no-value-attr></script>two"
    assert html_strip(test, {"SCRIPT"}) == gold


def test_style():  # testStyle
    test = (
        'one<style type="text/css">\n<!--\n'
        "@import url('http://www.lasletrasdecanciones.com/css.css');\n-->\n"
        "</style>two"
    )
    assert html_strip(test) == "one\ntwo"


def test_escape_style():  # testEscapeStyle
    test = 'one<style type="text/css"> body,font,a { font-family:arial; } </style>two'
    gold = 'one<style type="text/css"></style>two'
    assert html_strip(test, {"STYLE"}) == gold


def test_br():  # testBR
    assert html_strip("one<BR />two<br>three") == "one\ntwo\nthree"
    assert html_strip("one<BR some stuff here too>two</BR>") == "one\ntwo\n"


def test_escape_br():  # testEscapeBR
    test = "one<BR class='whatever'>two</\nBR\n>"
    assert html_strip(test, {"BR"}) == test


def test_inline_tags_no_space():  # testInlineTagsNoSpace
    test = 'one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three'
    assert html_strip(test) == "onetwo2e.three"


def test_cdata():  # testCDATA (static vectors)
    pairs = [
        (
            "one<![CDATA[<one><two>three<four></four></two></one>]]>two",
            "one<one><two>three<four></four></two></one>two",
        ),
        (
            "one<![CDATA[two<![CDATA[three]]]]><![CDATA[>four]]>five",
            "onetwo<![CDATA[three]]>fourfive",
        ),
        ("<! [CDATA[&]]>", ""),
        ("<! [CDATA[&] ] >", ""),
        ("<! [CDATA[&]]", "<! [CDATA[&]]"),
        ("<! [CDATA[&]]>", ""),
        ("<! [CDATA[&] ] >", ""),
        ("<! [CDATA[&] ] ", "<! [CDATA[&] ] "),
        ("<![CDATA[", ""),
        ("<![CDATA[<br>", "<br>"),
        ("<![CDATA[<br>]]", "<br>]]"),
        ("<![CDATA[<br>]]>", "<br>"),
        ("<![CDATA[<br>] ] >", "<br>] ] >"),
        ("<![CDATA[<br>] ] >", "<br>] ] >"),
        ("<! [CDATA[", "<! [CDATA["),
    ]
    for html, gold in pairs:
        assert html_strip(html) == gold, html


def test_unclosed_angle_bang():  # testUnclosedAngleBang
    assert html_strip("<![endif]") == "<![endif]"


def test_uppercase_character_entity_variants():  # testUppercaseCharacterEntityVariants
    test = " &QUOT;-&COPY;&GT;>&LT;<&REG;&AMP;"
    gold = ' "-©>><<®&'
    assert html_strip(test) == gold


def test_msword_malformed_processing_instruction():  # testMSWordMalformedProcessingInstruction
    test = 'one<?xml:namespace prefix = o ns = "urn:schemas-microsoft-com:office:office" />two'
    assert html_strip(test) == "onetwo"


def test_supplementary_chars_in_tags():  # testSupplementaryCharsInTags
    test = (
        "one<\U00029b05艱鍟䇹愯瀛>two<瀛愯\U00029b05>three 瀛愯\U00029b05"
        "</瀛愯\U00029b05>four</\U00029b05艱鍟䇹愯瀛>five<\U00020000\U00020000>"
        "six<\U00020000\U00020000/>seven"
    )
    gold = "one\ntwo\nthree 瀛愯\U00029b05\nfour\nfive\nsix\nseven"
    assert html_strip(test) == gold


def test_utf16_surrogates():  # testUTF16Surrogates (code-point space)
    sup = chr(((0xD86C - 0xD800) << 10) + (0xDC01 - 0xDC00) + 0x10000)
    assert html_strip(" one two &#xD86C;&#XdC01;three") == f" one two {sup}three"
    assert html_strip(" &#55404;&#XdC01;") == f" {sup}"
    assert html_strip(" &#xD86C;&#56321;") == f" {sup}"
    assert html_strip(" &#55404;&#56321;") == f" {sup}"
    # improperly paired
    assert html_strip(" &#55404;&#57999;") == " �"
    assert html_strip(" &#xD86C;&#57999;") == " �"
    assert html_strip(" &#55002;&#XdC01;") == " 훚�".replace(
        "훚", chr(0xD6DA)
    )
    # unpaired high surrogates
    assert html_strip(" &#Xd921;") == " �"
    assert html_strip(" &#Xd921") == " �"
    assert html_strip(" &#Xd921<br>") == " &#Xd921\n"


def test_close_br():  # testCloseBR
    assert html_strip(" Secretary)</br> [[M") == " Secretary)\n [[M"


def test_offsets():  # testOffsets / doTestOffsets
    for text in (
        "hello <p> X<p> how <p>X are you",
        "X &amp; X &#40; X &lt; &gt; X",
        "X < &zz >X &# < X > < &l > &g < X",
    ):
        stripped, pos, diff = html_strip_offsets(text)
        str_off = -1
        for off, ch in enumerate(stripped):
            if ch == "X":
                str_off = text.index("X", str_off + 1)
                assert correct_offset(off, pos, diff) == str_off, (text, off)


def test_legal_offsets():  # testLegalOffsets
    for text in ("hello world", "hello &#x world"):
        stripped, pos, diff = html_strip_offsets(text)
        for off in range(len(stripped) + 1):
            assert correct_offset(off, pos, diff) <= len(text)


def test_html_file_sanity():  # testHTML, over the reference's resource file
    import os

    path = os.path.join(REF_TEST_DIR, "htmlStripReaderTest.html")
    if not os.path.exists(path):
        pytest.skip("reference resource not present")
    with open(path, encoding="utf-8") as f:
        html = f.read()
    out = html_strip(html)
    assert "&lt;" not in out
    assert "forrest" not in out and "Forrest" not in out
    assert out.strip().startswith("Welcome to Solr")
    assert out.strip().endswith("Foundation.")


def test_msword_file():  # testMSWord14GeneratedHTML
    import os

    path = os.path.join(REF_TEST_DIR, "MS-Word 14 generated.htm")
    if not os.path.exists(path):
        pytest.skip("reference resource not present")
    with open(path, encoding="utf-8") as f:
        html = f.read()
    assert html_strip(html).strip() == "This is a test"


# ---------------------------------------------------------------------------
# Batch path
# ---------------------------------------------------------------------------

def test_batch_matches_scanner():
    docs = [
        "plain text, no markup at all",
        "<p>simple block</p> and <b>bold</b> text",
        "<div class=x>attr</div><br/>tail",
        None,
        "entity &amp; doc routes to the scanner",
        "<script>drop();</script>kept",
        "<li><a href=\"#28\" title=\"Hubert \"Geese\" Ausby\">H</a></li>",
        "",
        "stray < bracket",
        "<UL><LI>item</LI></UL>",
    ]
    got = html_strip_batch(docs).to_pylist()
    want = [None if d is None else html_strip(d) for d in docs]
    assert got == want


def test_batch_fast_path_equivalence_random():
    # deterministic pseudo-random clean-profile docs: fast path and scanner
    # must agree exactly
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    tags = ["p", "div", "span", "b", "i", "ul", "li", "em", "td", "h1"]
    docs = []
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 20)):
            r = rng.rand()
            w = words[rng.randint(len(words))]
            t = tags[rng.randint(len(tags))]
            if r < 0.4:
                parts.append(w + " ")
            elif r < 0.6:
                parts.append(f"<{t}>")
            elif r < 0.8:
                parts.append(f"</{t}>")
            else:
                parts.append(f"<{t} class=x id=y>{w}</{t}>")
        docs.append("".join(parts))
    got = html_strip_batch(docs).to_pylist()
    want = [html_strip(d) for d in docs]
    assert got == want


def test_batch_arrow_input():
    arr = pa.array(["<p>a</p>", "b &amp; c", None])
    out = html_strip_batch(arr)
    assert out.to_pylist() == ["\na\n", "b & c", None]
