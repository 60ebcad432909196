"""Vocabulary constants the reference ships as helper modules
(foaf.js, skos.js, dcterms.js, wikidata.js — constants only)."""

# foaf.js
FOAF_NAME_URI = "<http://xmlns.com/foaf/0.1/name>"
FOAF_NICK_URI = "<http://xmlns.com/foaf/0.1/nick>"
FOAF_MBOX_SHA1SUM = "<http://xmlns.com/foaf/0.1/mbox_sha1sum>"

# skos.js
SKOS_ALT_LABEL_URI = "<http://www.w3.org/2004/02/skos/core#altLabel>"
SKOS_PREF_LABEL_URI = "<http://www.w3.org/2004/02/skos/core#prefLabel>"

# dcterms.js
DCTERMS_CONTRIBUTOR_URI = "<http://purl.org/dc/terms/contributor>"
DC_TITLE_URI = "<http://purl.org/dc/elements/1.1/title>"

# wikidata.js
WIKIDATA_INSTANCE_OF_URI = "<http://www.wikidata.org/prop/direct/P31>"
WIKIDATA_SUBCLASS_OF_URI = "<http://www.wikidata.org/prop/direct/P279>"
