"""Stop-word list.

The 174-word English stop-word list the reference ships as a data file
(phoenixLab/Stop_Words.txt, consumed via one getline at
phoenixLab/wordCount/wordCount.cpp:122-127).  Two artifacts:

- STOP_WORDS: the set, for idiomatic-mode anti-join filtering.
- STOP_LINE:  the words joined by single spaces in original file order —
  required for exact-parity substring filtering: the reference drops any
  word that occurs as a SUBSTRING of this line
  (``stop_words.find(word) == npos`` keeps, wordCount.cpp:152), which is
  stricter than set membership (e.g. "he", "a", "in" are dropped because
  they appear inside other stop words).
"""

_WORDS_TEXT = """\
a about above after again against ain't all am an and any are aren't as at
be because been before being below between both but by can can't could
couldn't did didn't do does doesn't doing don't down during each few for
from further had hadn't has hasn't have haven't having he he'd he'll he's
her here here's hers herself him himself his how how's my i i'd i'll i'm
i've if in into is isn't it it's its itself just let's me mightn't more
most mustn't same myself needn't no nor not now of off on once only or
other ought our ours ourselves out over own then shan't she she'd she'll
she's should should've shouldn't so some such than that that'll that's the
their theirs them themselves we'll there there's these they they'd they're
they've this those through to too under until up very was wasn't we we'd
why's we're we've were weren't what what's when whens where where's which
while who who's whom why will with won't why would wouldn't you you'd
you'll you're you've your yours yourself yourselves"""

STOP_WORDS: tuple[str, ...] = tuple(_WORDS_TEXT.split())
STOP_LINE: str = " ".join(STOP_WORDS)

assert len(STOP_WORDS) == 182
