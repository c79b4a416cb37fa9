"""Standalone golden sweep (used by .claude/skills/verify): prints per-class
pass counts for the readability and ftr golden fixtures."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from article_extractor_spark.core import pipeline
from article_extractor_spark.core.pipeline import get_parser
from article_extractor_spark.core.urlutil import Url

base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

def rd(*p):
    return open(os.path.join(base, *p), encoding="utf-8", newline="").read()

names = sorted(os.listdir(os.path.join(base, "readability")))
ok = sum(pipeline.run_golden_pipeline(rd("readability", n, "source.html")) ==
         rd("readability", n, "expected.html") for n in names)
print(f"readability: {ok}/{len(names)} byte-identical")

hostmap = {"golem": "golem.de", "phoronix": "phoronix.com", "youtube": "youtube.com",
           "hardwareluxx": "hardwareluxx.de", "heise-1": "heise.de", "spiegel-1": "spiegel.de"}
parser = get_parser()
ok = 0
for n, host in hostmap.items():
    art = parser.parse_offline([rd("ftr", n, "source.html")],
                               config=parser.config_files.get(host + ".txt"),
                               url=Url.parse(f"https://www.{host}/"))
    ok += art.html == rd("ftr", n, "expected.html")
print(f"ftr: {ok}/{len(hostmap)} byte-identical")
