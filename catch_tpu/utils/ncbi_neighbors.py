"""NCBI Entrez client for downloading genome neighbors.

Capability parity with the reference
(/root/reference/catch/utils/ncbi_neighbors.py:21-466): retrying
urlopen with exponential + random backoff, neighbors-table download and
parsing into Neighbor records, the separate influenza path via the NCBI
influenza FTP databases (taxids 11320/11520/11552, with year sanity
checks), rate-limited batched efetch FASTA downloads into a tempfile,
and the ``construct_fasta_for_taxid`` facade.  Module-global
``ncbi_api_key`` raises the request rate.
"""

import datetime
import gzip
import logging
import random
import re
import tempfile
import time
import urllib.error
import urllib.parse
import urllib.request

logger = logging.getLogger(__name__)

# Global variable for API key (set by CLI --ncbi-api-key)
ncbi_api_key = None


def urlopen_with_tries(url, initial_wait=5, rand_wait_range=(1, 60),
                       max_num_tries=5):
    """Open a URL with retries: exponential backoff plus a random wait
    (helps desynchronize parallel callers hitting NCBI's rate cap)."""
    num_tries = 0
    while num_tries < max_num_tries:
        try:
            num_tries += 1
            logger.debug("Making request to open url: %s", url)
            return urllib.request.urlopen(url)
        except urllib.error.HTTPError as e:
            if num_tries == max_num_tries:
                logger.critical(
                    "Encountered HTTPError %d times (the maximum "
                    "allowed) when opening url: %s; error: %s",
                    num_tries, url, e)
                raise
            wait = initial_wait * 2 ** (num_tries - 1)
            rand_wait = random.randint(*rand_wait_range)
            total_wait = wait + rand_wait
            logger.info(
                "Encountered HTTPError when opening url; sleeping for "
                "%d seconds, and then trying again (try %d of %d); "
                "error: %s", total_wait, num_tries, max_num_tries, e)
            time.sleep(total_wait)
        except Exception:
            logger.critical(
                "Encountered unexpected error while opening url: %s", url)
            raise


def ncbi_neighbors_url(taxid):
    """URL of the genome-neighbors table for a taxid."""
    params = {"taxid": taxid, "cmd": "download2"}
    if ncbi_api_key is not None:
        params["api_key"] = ncbi_api_key
    return ("https://www.ncbi.nlm.nih.gov/genomes/GenomesGroup.cgi?%s"
            % urllib.parse.urlencode(params))


def fetch_neighbors_table(taxid):
    """Yield non-empty lines of the neighbors table for a taxid."""
    logger.debug("Fetching table of neighbors for tax %d", taxid)
    r = urlopen_with_tries(ncbi_neighbors_url(taxid))
    raw_data = r.read()
    for line in raw_data.decode("utf-8").split("\n"):
        line_rstrip = line.rstrip()
        if line_rstrip != "":
            yield line_rstrip


def ncbi_influenza_genomes_url(database="genomeset"):
    """URL of an NCBI influenza genomes database dump."""
    assert database in ["genomeset", "influenza_na"]
    return ("ftp://ftp.ncbi.nih.gov/genomes/INFLUENZA/" + database
            + ".dat.gz")


def fetch_influenza_genomes_table(species_name, database):
    """Yield lines of the influenza genome table containing
    species_name (case-insensitive)."""
    logger.debug("Fetching table of influenza genomes for species %s",
                 species_name)
    species_name_lower = species_name.lower()
    r = urlopen_with_tries(ncbi_influenza_genomes_url(database))
    raw_data = gzip.GzipFile(fileobj=r).read()
    for line in raw_data.decode("utf-8").split("\n"):
        line_rstrip = line.rstrip()
        if line_rstrip != "" and species_name_lower in line_rstrip.lower():
            yield line_rstrip


def ncbi_fasta_download_url(accessions):
    """efetch URL for a batch of accessions."""
    ids = ",".join(accessions)
    params = {"id": ids, "db": "nuccore", "rettype": "fasta",
              "retmode": "text"}
    if ncbi_api_key is not None:
        params["api_key"] = ncbi_api_key
    params_url = urllib.parse.urlencode(params, safe=",")
    return ("https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi?%s"
            % params_url)


def fetch_fastas(accessions, batch_size=100, reqs_per_sec=2):
    """Download sequences for accessions into a tempfile, batched and
    rate-limited (2 req/s; 7 with an API key)."""
    logger.debug("Fetching fasta files for %d accessions",
                 len(accessions))
    if ncbi_api_key is not None:
        reqs_per_sec = 7
    fp = tempfile.NamedTemporaryFile()
    for i in range(0, len(accessions), batch_size):
        batch = accessions[i:i + batch_size]
        r = urlopen_with_tries(ncbi_fasta_download_url(batch))
        raw_data = r.read()
        for line in raw_data.decode("utf-8").split("\n"):
            fp.write((line + "\n").encode())
        time.sleep(1.0 / reqs_per_sec)
    fp.seek(0)
    return fp


class Neighbor:
    """Immutable representation of a genome neighbor."""

    def __init__(self, acc, refseq_acc, hosts, lineage, tax_name, segment,
                 metadata={}):
        self.acc = acc
        self.refseq_acc = refseq_acc
        self.hosts = hosts
        self.lineage = lineage
        self.tax_name = tax_name
        self.segment = segment
        self.metadata = metadata

    def _list_of_attrs(self):
        return [self.refseq_acc, self.hosts, self.lineage, self.tax_name,
                self.segment, self.metadata]

    def __eq__(self, other):
        return (self.acc == other.acc
                and self.refseq_acc == other.refseq_acc
                and sorted(self.hosts) == sorted(other.hosts)
                and self.lineage == other.lineage
                and self.tax_name == other.tax_name
                and self.segment == other.segment
                and self.metadata == other.metadata)

    def __repr__(self):
        return ";".join('"' + str(s) + '"'
                        for s in [self.acc] + self._list_of_attrs())

    def __str__(self):
        return self.acc + " : " + ", ".join(
            '"' + str(s) + '"' for s in self._list_of_attrs())


def construct_neighbors(taxid):
    """Neighbor objects for all neighbors of a taxid."""
    logger.info("Constructing a list of neighbors for taxid %d", taxid)

    expected_col_order = ["Representative", "Neighbor", "Host",
                          "Selected lineage", "Taxonomy name",
                          "Segment name"]
    neighbors = []
    encountered_header = False
    for line in fetch_neighbors_table(taxid):
        if len(line.strip()) == 0:
            continue
        ls = line.split("\t")
        if line.startswith("##"):
            encountered_header = True
            if line.startswith("## Columns:"):
                col_names = [n.replace('"', "") for n in ls[1:]]
                if expected_col_order != col_names:
                    raise Exception(
                        "The order of columns in the neighbor list does "
                        "not match the expected order")
            continue
        if not encountered_header:
            logger.critical(
                "Neighbors table for taxid %s did not contain the "
                "expected header; it is possible that this is not a "
                "valid species ID", taxid)

        refseq_acc = ls[0]
        acc = ls[1]
        hosts = ls[2].split(",")
        lineage = tuple(ls[3].split(","))
        tax_name = ls[4]
        segment = ls[5].replace("segment", "").strip()
        neighbors.append(
            Neighbor(acc, refseq_acc, hosts, lineage, tax_name, segment))
    return neighbors


_INFLUENZA_SPECIES = {11320: "Influenza A virus",
                      11520: "Influenza B virus",
                      11552: "Influenza C virus"}
_INFLUENZA_LINEAGES = {
    11320: ("Orthomyxoviridae", "Alphainfluenzavirus",
            "Influenza A virus"),
    11520: ("Orthomyxoviridae", "Betainfluenzavirus",
            "Influenza B virus"),
    11552: ("Orthomyxoviridae", "Gammainfluenzavirus",
            "Influenza C virus"),
}


def construct_influenza_genome_neighbors(taxid):
    """Neighbor objects for influenza genomes (separate NCBI FTP DB;
    genomeset for A/B, influenza_na for C; year sanity checks)."""
    logger.info("Constructing a list of neighbors for influenza species "
                "with tax %d", taxid)
    if taxid not in _INFLUENZA_SPECIES:
        raise ValueError(
            "Taxid (%d) must be for either influenza A or influenza B "
            "virus species" % taxid)
    species_name = _INFLUENZA_SPECIES[taxid]
    lineage = _INFLUENZA_LINEAGES[taxid]

    year_p = re.compile("([1-2][0-9]{3})")
    curr_year = int(datetime.datetime.now().year)

    database = "genomeset" if taxid in (11320, 11520) else "influenza_na"

    neighbors = []
    for line in fetch_influenza_genomes_table(species_name, database):
        if len(line.strip()) == 0:
            continue
        ls = line.split("\t")
        acc = ls[0]
        hosts = [ls[1]]
        segment = ls[2]
        subtype = ls[3]
        country = ls[4]
        date = ls[5]
        seq_len = int(ls[6])
        name = ls[7]

        year_m = year_p.search(date)
        if year_m is None:
            continue
        year = int(year_m.group(1))
        if year > curr_year:
            # A year in the future is probably a typo
            continue

        metadata = {"subtype": subtype, "country": country, "year": year,
                    "seq_len": seq_len}
        neighbors.append(Neighbor(acc, None, hosts, lineage, name,
                                  segment, metadata=metadata))
    return neighbors


def construct_fasta_for_taxid(taxid, segment=None,
                              influenza_species={11320, 11520, 11552},
                              write_to=None):
    """Fetch accessions + FASTA for a taxonomy.

    Returns:
        tempfile object containing the sequences in FASTA format
    """
    if not isinstance(taxid, int):
        try:
            taxid = int(taxid)
        except ValueError as error:
            raise ValueError(
                "'%s' is not a valid NCBI taxonomic ID; it must be an "
                "integer" % taxid) from error

    if segment is None:
        logger.info("Creating a FASTA file for taxid %d", taxid)
    else:
        logger.info("Creating a FASTA file for taxid %d, segment %s",
                    taxid, segment)

    if taxid in influenza_species:
        neighbors = construct_influenza_genome_neighbors(taxid)
    else:
        neighbors = construct_neighbors(taxid)
    if len(neighbors) == 0:
        raise Exception("No neighbors were found for taxid %d" % taxid)

    if segment is not None:
        neighbors = [n for n in neighbors if n.segment == segment]
        if len(neighbors) == 0:
            raise Exception(
                "After filtering for segment '%s', no neighbors are "
                "left for taxid %d" % (segment, taxid))

    unique_acc = set(n.acc for n in neighbors)
    logger.info("There are %d neighbors, %d of which have unique "
                "accessions", len(neighbors), len(unique_acc))

    if write_to is not None:
        with open(write_to, "w") as fw:
            for acc in sorted(unique_acc):
                fw.write(str(acc) + "\n")

    return fetch_fastas(list(unique_acc))
