"""Scoring weights, tag sets and regexes.

Regex-for-regex port of the reference's heuristic tables
(`/root/reference/src/constants.rs:1-235`), including its intentional
quirks which the golden outputs depend on:

* ``SIBLING_CONTENT``/``HAS_CONTENT`` include literal slashes (they are
  JS-regex-literals pasted as strings and thus almost never match),
* ``BLOCKQUITE`` (sic) in the init-score table means BLOCKQUOTE scores 0,
* the misspelled ``UNLIELY_CANDIDATES`` name is kept for traceability.
"""

import re

DEFAULT_CHAR_THRESHOLD = 500

IS_IMAGE = re.compile(r"\.(jpg|jpeg|png|webp)", re.IGNORECASE)
COPY_TO_SRCSET = re.compile(r"\.(jpg|jpeg|png|webp)\s+\d", re.IGNORECASE)
COPY_TO_SRC = re.compile(r"^\s*\S+\.(jpg|jpeg|png|webp)\S*\s*$", re.IGNORECASE)
IS_BASE64 = re.compile(r"base64\s*", re.IGNORECASE)
SIBLING_CONTENT = re.compile(r"/\.( |$)/")
BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", re.IGNORECASE)
NORMALIZE = re.compile(r"\s{2,}")
TOKENIZE = re.compile(r"\W+")
UNLIELY_CANDIDATES = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|"
    r"disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies|"
    r"rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break|"
    r"agegate|pagination|pager|popup|yom-remote",
    re.IGNORECASE,
)
OKAY_MAYBE_ITS_A_CANDIDATE = re.compile(
    r"and|article|body|column|content|main|shadow", re.IGNORECASE
)
HAS_CONTENT = re.compile(r"/\S$/")
HASH_URL = re.compile(r"^#.+")
POSITIVE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|"
    r"text|blog|story",
    re.IGNORECASE,
)
NEGATIVE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"foot|footer|footnote|gdpr|masthead|media|meta|outbrain|promo|related|"
    r"scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|tool|"
    r"widget",
    re.IGNORECASE,
)
SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", re.IGNORECASE)
SRC_SET_URL = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))")
TITLE_SEPARATOR = re.compile(r" [-|—\\/>»] ")
TITLE_CUT_END = re.compile(r"(.*)[-|—\\/>»] .*", re.IGNORECASE)
WORD_COUNT = re.compile(r"\s+")
TITLE_CUT_FRONT = re.compile(r"[^-|\\/>»]*[-|\\/>»](.*)", re.IGNORECASE)
VIDEOS = re.compile(
    r"(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq)"
    r"\.com|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
    re.IGNORECASE,
)
BASE64_DATA_URL = re.compile(r"^data:\s*([^\s;,]+)\s*;\s*base64\s*,", re.IGNORECASE)

SCORE_ATTR = "content_score"
DATA_TABLE_ATTR = "is_data_table"
MINIMUM_TOPCANDIDATES = 3

UNLIKELY_ROLES = (
    "menu", "menubar", "complementary", "navigation", "alert", "alertdialog",
    "dialog",
)

DEFAULT_TAGS_TO_SCORE = frozenset(
    ("SECTION", "H2", "H3", "H4", "H5", "H6", "P", "TD", "PRE")
)
PRESENTATIONAL_ATTRIBUTES = (
    "align", "background", "bgcolor", "border", "cellpadding", "cellspacing",
    "frame", "hspace", "rules", "style", "valign", "vspace",
)
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset(("TABLE", "TH", "TD", "HR", "PRE"))
DIV_TO_P_ELEMS = frozenset(
    ("BLOCKQUOTE", "DL", "DIV", "IMG", "OL", "P", "PRE", "TABLE", "UL")
)
VALID_EMPTY_TAGS = frozenset(
    ("AREA", "BASE", "BR", "COL", "EMBED", "HR", "IMG", "LINK", "META",
     "SOURCE", "TRACK", "IFRAME")
)
VALID_SELF_CLOSING_TAGS = frozenset(
    ("AREA", "BASE", "BR", "COL", "EMBED", "HR", "IMG", "INPUT", "LINK",
     "META", "PARAM", "SOURCE", "TRACK", "WBR")
)
ALTER_TO_DIV_EXCEPTIONS = frozenset(("DIV", "ARTICLE", "SECTION", "P"))
EMBED_TAG_NAMES = frozenset(("OBJECT", "EMBED", "IFRAME"))

PHRASING_ELEMS = frozenset((
    "ABBR", "AUDIO", "B", "BDO", "BR", "BUTTON", "CITE", "CODE", "DATA",
    "DATALIST", "DFN", "EM", "EMBED", "I", "IMG", "INPUT", "KBD", "LABEL",
    "MARK", "MATH", "METER", "NOSCRIPT", "OBJECT", "OUTPUT", "PROGRESS",
    "Q", "RUBY", "SAMP", "SCRIPT", "SELECT", "SMALL", "SPAN", "STRONG",
    "SUB", "SUP", "TEXTAREA", "TIME", "VAR", "WBR",
))

LEAD_IMAGE_URL_XPATH = "//link[@rel='image_src']"

POSITIVE_LEAD_IMAGE_URL_HINTS_REGEX = re.compile(
    "upload|wp-content|large|photo|wp-image", re.IGNORECASE
)
NEGATIVE_LEAD_IMAGE_URL_HINTS_REGEX = re.compile(
    "spacer|sprite|blank|throbber|gradient|tile|bg|background|icon|social|"
    "header|hdr|advert|spinner|loader|loading|default|rating|share|facebook|"
    "twitter|theme|promo|ads|wp-includes",
    re.IGNORECASE,
)
PHOTO_HINTS_REGEX = re.compile("figure|photo|image|caption", re.IGNORECASE)
GIF_REGEX = re.compile(r"\.gif(\?.*)?$", re.IGNORECASE)
JPG_REGEX = re.compile(r"\.jpe?g(\?.*)?$", re.IGNORECASE)
